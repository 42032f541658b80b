"""Mixed-precision victim forwards for the attack loops.

Round-2 measurement: running the CW attack fully in bf16 is 2.2x faster
but collapses targeted success 95% -> 42% — the margin logits and the
1e-7 init perturbations live below bf16 resolution (ROUND_NOTES). The
mixed scheme keeps the attack math (points, Adam state, losses, clips)
in f32 and runs only the VICTIM's trunk in bf16, with the classifier
head in f32:

  - every victim param is cast to bf16 EXCEPT the head Dense (kernel
    out-dim == num_classes). BatchNorm scales/statistics are cast too:
    under jnp dtype promotion an f32 BN would promote its output back
    to f32 and every layer after the first BN would silently run f32
    (all five victims interleave BN with Dense/Conv). bf16 BN costs
    ~2^-8 relative error on smooth batch statistics — orders of
    magnitude above the margin-logit sensitivity, which lives entirely
    in the head;
  - the input cloud is cast to bf16, so intermediate activations flow
    bf16 (MXU-fast) through the whole trunk, and at the head jnp's
    dtype promotion runs bf16-activation x f32-kernel in f32 — margin
    differences between logits are resolved at f32.

Model-agnostic: works on any registry victim whose classifier ends in a
Dense with `num_classes` outputs (all five do).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_trunk_bf16(variables, num_classes: int):
    """Cast params (incl. BatchNorm) to bf16 except the head Dense."""

    def cast(path, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        keys = [str(getattr(p, "key", getattr(p, "name", "")))
                for p in path]
        # head Dense params end in num_classes (no trunk layer in the
        # five victims is num_classes-wide)
        if x.shape and x.shape[-1] == num_classes and (
                keys and keys[-1] in ("kernel", "bias")):
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, variables)


def make_mixed_logits_fn(model, variables, num_classes: int,
                         masked: bool = False):
    """logits_fn running the victim trunk in bf16, head in f32.

    Returns a closure matching the attack layer's `logits_fn(pc)` (or
    `(pc, mask)` when masked) contract; logits come back f32.
    """
    cast_vars = cast_trunk_bf16(variables, num_classes)

    if masked:
        def logits_fn(pc, mask):
            logits, _ = model.apply(
                cast_vars, pc.astype(jnp.bfloat16), train=False,
                mask=mask)
            return logits.astype(jnp.float32)
    else:
        def logits_fn(pc):
            logits, _ = model.apply(
                cast_vars, pc.astype(jnp.bfloat16), train=False)
            return logits.astype(jnp.float32)
    return logits_fn
