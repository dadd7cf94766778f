"""Pure-numpy mergeable sketch cores (no Spark imports here)."""

from .base import Sketch
from .tdigest import TDigest

__all__ = ["Sketch", "TDigest"]
