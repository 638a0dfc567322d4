from .net_desc import init_net_params, net_forward, head_output_channels
from .convert import convert_torch_checkpoint, load_checkpoint, save_checkpoint
