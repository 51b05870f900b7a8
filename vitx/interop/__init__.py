from vitx.interop.torch_ref import (
    export_reference_state_dict,
    import_reference_state_dict,
)

__all__ = ["import_reference_state_dict", "export_reference_state_dict"]
