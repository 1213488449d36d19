"""SegRec — segment-integrated recommendation (Task 2).

A TPU-native rebuild of the reference's ReChorus-style framework
(/root/reference/SegRec): readers -> fixed-shape feeds -> flax models ->
jitted runners, plus the Clip* segment-integration models that weight
per-segment scores by Task-1 interest logits.
"""

from .corpus import Corpus
from .runner import RankingRunner, CTRRunner

__all__ = ["Corpus", "RankingRunner", "CTRRunner"]
