from vitx.interop.pretrained import (
    import_pretrained_state_dict,
    resize_pos_embed,
    vit_config_for_pretrained,
)
from vitx.interop.torch_ref import (
    export_reference_optimizer_state,
    export_reference_state_dict,
    import_reference_state_dict,
)

__all__ = [
    "import_reference_state_dict",
    "export_reference_state_dict",
    "export_reference_optimizer_state",
    "import_pretrained_state_dict",
    "resize_pos_embed",
    "vit_config_for_pretrained",
]
