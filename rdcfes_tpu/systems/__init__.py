from .transient import TransientRDCSystem, clamp_nonnegative
from .mixed import MixedTransientRDCSystem
from .solid import SolidSystem, SolidBC

__all__ = ["TransientRDCSystem", "MixedTransientRDCSystem",
           "clamp_nonnegative", "SolidSystem", "SolidBC"]
