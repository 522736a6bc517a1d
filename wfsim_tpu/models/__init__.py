from .params import SimParams, SimConstants, build_params, build_constants  # noqa: F401
from . import pmt, s1, s2, afterpulse                                      # noqa: F401
