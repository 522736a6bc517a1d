from . import interp          # noqa: F401
from . import randsample      # noqa: F401
from . import segment         # noqa: F401
from . import waveform        # noqa: F401
from . import zle             # noqa: F401

from .interp import GridMap, grid_lookup, regrid_scattered  # noqa: F401
from .randsample import (                                   # noqa: F401
    categorical_from_cdf, sample_inverse_cdf, truncated_exponential)
from .segment import repeat_to_capacity, segment_ids_from_counts  # noqa: F401
