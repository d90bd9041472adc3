from .index import HnswQuantizer, IvfIndex, build_luts, coarse_probe
from .operating_points import OperatingPoints
from .pairwise_decoder import PairwiseDecoder, train_pairwise_decoder
from .two_stage import run_search_two_stage

__all__ = [
    "IvfIndex",
    "HnswQuantizer",
    "coarse_probe",
    "build_luts",
    "OperatingPoints",
    "PairwiseDecoder",
    "train_pairwise_decoder",
    "run_search_two_stage",
]
