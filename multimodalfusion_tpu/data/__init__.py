from multimodalfusion_tpu.data import labels  # noqa: F401
