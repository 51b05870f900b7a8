from vitx.core.config import ViTConfig, PRESETS, get_config

__all__ = ["ViTConfig", "PRESETS", "get_config"]
