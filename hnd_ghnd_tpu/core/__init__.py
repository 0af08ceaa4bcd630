from hnd_ghnd_tpu.core.config import load_config, overwrite_config, overwrite_dict

__all__ = ["load_config", "overwrite_config", "overwrite_dict"]
