from .fsutils import mkdir, rm_n_mkdir, recur_find_ext, get_files, save_json
from .geometry import (
    get_bounding_box,
    cropping_center,
    center_pad_to_shape,
    remap_label,
    get_overlap,
)
from .logging import log_info, log_debug
