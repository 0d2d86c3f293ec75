"""Run the read-only reference implementation under this image's newer
numpy/pandas to measure its real numbers (BASELINE.md "Measured").

Usage (from /root/reference, results to an absolute dir):

    cd /root/reference && echo n | \
    PYTHONPATH=/root/repo/tools/ref_shims:/root/repo:/root/reference \
    python /root/repo/tools/run_reference.py /root/reference/main.py \
      --k 5 --which_splits 5foldcv_gbmlgg_german_omics_omic \
      --split_mode train_val --task gbmlgg_survival_german_omics \
      --mode omic --model_type max_net --max_epochs 200 \
      --bag_loss cox_surv --batch_size 128 --seed 0 --early_stopping \
      --n_classes 4 --drop_out --alpha_surv 0.6 --cancer_type brain \
      --reg_type all --data_root_dir /tmp/refrun/feat \
      --results_dir /tmp/refrun/results --overwrite

ref_shims provides: sksurv/lifelines c-index delegating to this repo's
pinned-parity implementation, a torchvision.transforms stub, a package
that routes `datasets` to the reference's local directory (HuggingFace
datasets would shadow it), and the `echo n` answers the reference's
"replace split?" prompt. This file patches removed numpy aliases, then
execs the reference script unmodified."""
import sys

import numpy as np

# numpy 2.0 removed this alias the 2021-era reference uses (patch
# minimally: np.bool/np.object exist again in numpy 2 and overriding
# them breaks numpy.ma internals)
np.Inf = np.inf

# scipy >= 1.10 removed the `scipy.interp` re-export the reference's
# utils_analysis/evaluation.py:32 imports (it was always np.interp)
import scipy  # noqa: E402

if not hasattr(scipy, "interp"):
    scipy.interp = np.interp

import runpy  # noqa: E402

script = sys.argv[1]
sys.argv = [script] + sys.argv[2:]
runpy.run_path(script, run_name="__main__")
