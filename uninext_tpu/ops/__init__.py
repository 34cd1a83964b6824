from .msda import ms_deform_attn  # noqa: F401
