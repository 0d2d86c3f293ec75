from multimodalfusion_tpu.extract.features import Embedder  # noqa: F401
