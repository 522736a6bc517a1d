from . import gather          # noqa: F401
from . import interp          # noqa: F401
from . import randsample      # noqa: F401
from . import segment         # noqa: F401
from . import waveform        # noqa: F401
from . import zle             # noqa: F401

from .gather import gather_spans, stream_compact            # noqa: F401
from .interp import GridMap, grid_lookup, regrid_scattered  # noqa: F401
from .randsample import (                                   # noqa: F401
    categorical_from_cdf, search_sorted_rows, sample_inverse_cdf,
    truncated_exponential)
from .segment import (                                      # noqa: F401
    repeat_to_capacity, segment_ids_from_counts, expand_rows,
    segment_min_max, sorted_segment_sum)
