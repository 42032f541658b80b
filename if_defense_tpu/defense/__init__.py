"""Defenses: SRS / SOR / DUP-Net preprocessing + IF-Defense restoration.

Registry mirrors `baselines/defense/__init__.py` plus the IF-Defense
drivers from `{ONet,ConvONet}/{opt,remesh}_defense.py`.
"""

from if_defense_tpu.defense.srs import srs_defense
from if_defense_tpu.defense.sor import sor_defense, sor_defense_fixed
from if_defense_tpu.defense.dupnet import DUPNet, process_data_fixed
from if_defense_tpu.defense.punet import PUNet
from if_defense_tpu.defense.repulsion import repulsion_loss
from if_defense_tpu.defense.ifdefense import (
    make_opt_defense,
    convonet_opt_defense,
    onet_opt_defense,
)

__all__ = [
    "make_opt_defense",
    "convonet_opt_defense",
    "onet_opt_defense",
    "srs_defense",
    "sor_defense",
    "sor_defense_fixed",
    "DUPNet",
    "process_data_fixed",
    "PUNet",
    "repulsion_loss",
]
