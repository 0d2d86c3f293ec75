from multimodalfusion_tpu.engine.train import TrainConfig, train_fold  # noqa: F401
