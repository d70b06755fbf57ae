from . import response
from .pihna import pihna_physics, PIHNA_VARS
from .adpm import adpm_physics, ADPM_VARS
from .proteas import proteas_physics, PROTEAS_VARS
from .ripf import ripf_physics, RIPF_VARS
from .hcc import hcc_physics, HCC_VARS

__all__ = [
    "response",
    "pihna_physics", "PIHNA_VARS",
    "adpm_physics", "ADPM_VARS",
    "proteas_physics", "PROTEAS_VARS",
    "ripf_physics", "RIPF_VARS",
    "hcc_physics", "HCC_VARS",
]
