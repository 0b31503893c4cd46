from .torch_convert import convert_state_dict, load_pth_tar  # noqa: F401
