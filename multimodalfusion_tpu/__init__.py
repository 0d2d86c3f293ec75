"""multimodalfusion_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multimodal cancer-outcome (survival) prediction.

Re-designed from scratch with the capabilities of the reference
``MultimodalFusion/multimodalfusion`` PyTorch pipeline (see SURVEY.md):
radiology (MRI/CT) + pathology (WSI) + genomics fusion for survival
prediction, with attention-MIL over variable-length feature bags, survival
losses (discrete-hazard NLL / Cox / ranking), k-fold drivers, feature
extraction, and interpretability.

TPU-first design decisions (vs. the reference):
  * MIL bags are padded + masked and batched ([B, N, D] with [B, N] masks)
    so batch_size > 1 works under jit (reference forces batch_size=1,
    ref README.md:95).
  * Attention pooling is a fused Pallas kernel (masked segment softmax +
    weighted pooling) with a pure-jnp fallback for CPU/testing.
  * Training steps are jit-compiled pure functions over a
    ``jax.sharding.Mesh`` (data-parallel batch sharding).
  * Survival metrics (censored concordance, KM, integrated Brier score)
    are implemented natively (no sksurv/lifelines dependency).
"""

__version__ = "0.1.0"

from multimodalfusion_tpu import losses, metrics  # noqa: F401
