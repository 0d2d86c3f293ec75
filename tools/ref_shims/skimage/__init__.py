"""Import-time stub: reference utils/ct_preprocess_utils.py imports
skimage.{measure,morphology} at module load; the gradcam parity path
never calls them."""
from . import measure, morphology  # noqa: F401
