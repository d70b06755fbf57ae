from .getpot import Deck, export_integers
from . import dat
from .vtu import ParaviewWriter
from . import csv_metrics
from . import exodus
from . import provenance

__all__ = ["Deck", "export_integers", "dat", "ParaviewWriter", "csv_metrics",
           "exodus", "provenance"]
