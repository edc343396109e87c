from ccve_tpu.core.chunk import Chunk
from ccve_tpu.core.collection import DataCollection

__all__ = ["Chunk", "DataCollection"]
