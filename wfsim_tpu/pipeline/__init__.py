from .digitize import digitize_window     # noqa: F401
from .rawdata import RawDataTPU            # noqa: F401
from .optical import RawDataOpticalTPU     # noqa: F401
from .chunker import ChunkRawRecords       # noqa: F401
