from .cc_cpu import label, remove_small_objects, binary_fill_holes, watershed
from .postproc import (
    PostProcInstErodedMap,
    PostProcInstErodedContourMap,
    get_inst_info_dict,
    POSTPROC_FUNC_DICT,
)
