"""Command-line drivers mirroring the reference entry points.

train / hybrid_train / inference / defend_npz / attack / opt_defense /
remesh_defense — each a one-shot CLI over the npz interchange schema.
"""
