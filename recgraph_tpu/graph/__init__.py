from .poagraph import PoaGraph  # noqa: F401
from .pathgraph import PathGraph  # noqa: F401
