from .cap import Cap  # noqa: F401
from .cell import Cell  # noqa: F401
from .cellunion import CellUnion  # noqa: F401
from .coverer import RegionCoverer  # noqa: F401
from .intervals import R1Interval, S1Interval  # noqa: F401
from .loop import Loop  # noqa: F401
from .polygon import Polygon  # noqa: F401
from .rect import Rect  # noqa: F401
from .rect_bounder import RectBounder, expand_for_subregions  # noqa: F401
