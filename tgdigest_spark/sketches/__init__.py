"""Pure-numpy mergeable sketch cores (no Spark imports here)."""

from .base import Sketch
from .bloom import Bloom
from .countmin import CountMin
from .countsketch import CountSketch
from .ddsketch import DDSketch
from .freq import FrequentItems
from .hll import HLL
from .kll import KLL
from .multi import MultiSketch
from .kmv import KMV
from .prioritysample import PrioritySample
from .tdigest import TDigest

__all__ = [
    "Sketch",
    "TDigest",
    "KLL",
    "HLL",
    "CountMin",
    "CountSketch",
    "DDSketch",
    "Bloom",
    "KMV",
    "PrioritySample",
    "FrequentItems",
    "MultiSketch",
]
