from .patching import prepare_patching, make_channel_index_map
