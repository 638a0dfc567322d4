from .ioconfig import IOSegmentorConfig
from .coords import get_coordinates, filter_coordinates, get_tile_info
from .merge import CanvasSet
from .reader import WSIReader, VirtualWSIReader, NpyPyramidReader, open_wsi
