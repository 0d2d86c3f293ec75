from multimodalfusion_tpu.interpret.ig import integrated_gradients  # noqa: F401
