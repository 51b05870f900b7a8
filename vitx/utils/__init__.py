from vitx.utils.debug import dump_params, param_summary

__all__ = ["dump_params", "param_summary"]
