from .torch_loader import convert_state_dict, detect_model_config, load_torch_checkpoint

__all__ = ["convert_state_dict", "detect_model_config", "load_torch_checkpoint"]
