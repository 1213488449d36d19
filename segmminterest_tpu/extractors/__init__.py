"""TPU-native feature extraction (dataset construction, SURVEY.md §2.D).

visual: CLIP ViT vision tower over per-5s video frames with spatial pooling
        (reference data_process/visual_feature_extractor.py).
audio:  Whisper encoder over 5 s audio segments
        (reference data_process/audio_feature_extractor.py).
cache:  crash-safe extraction cache + memmap assembly
        (reference MMinterest/utils/util_file.py LargeHDF5Cache).
"""

from .cache import ExtractionCache, assemble_memmap
from .visual import VisualExtractor
from .audio import AudioExtractor

__all__ = ["ExtractionCache", "assemble_memmap", "VisualExtractor",
           "AudioExtractor"]
