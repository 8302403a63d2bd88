from virtex_tpu.utils.beam_search import AutoRegressiveBeamSearch
from virtex_tpu.utils.nucleus_sampling import AutoRegressiveNucleusSampling
from virtex_tpu.utils.timer import Timer

__all__ = [
    "AutoRegressiveBeamSearch",
    "AutoRegressiveNucleusSampling",
    "Timer",
]
