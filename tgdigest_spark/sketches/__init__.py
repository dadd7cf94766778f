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

# The ONE MAGIC→class map. MultiSketch child dispatch and the SQL
# surface (sqlfns.sketch_from_blob / tg_merge) both dispatch through
# this — a new sketch kind is registered here and nowhere else.
BY_MAGIC = {
    t.MAGIC: t
    for t in (
        Bloom,
        CountMin,
        CountSketch,
        DDSketch,
        FrequentItems,
        HLL,
        KLL,
        KMV,
        MultiSketch,
        PrioritySample,
        TDigest,
    )
}

__all__ = [
    "Sketch",
    "BY_MAGIC",
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
