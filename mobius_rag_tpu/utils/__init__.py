from mobius_rag_tpu.utils.shapes import (  # noqa: F401
    cdiv,
    pad_axis_to,
    round_up,
)
