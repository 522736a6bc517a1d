from .instructions import (                 # noqa: F401
    rand_instructions, random_instructions, instruction_from_csv,
    read_optical)
from .simulator import Simulator            # noqa: F401
