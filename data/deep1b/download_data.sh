#!/bin/bash
# Download the Deep1B dataset into data/deep1b/ (big-ann-benchmarks
# distribution, .fbin format) and convert to .fvecs.
set -e
cd "$(dirname "$0")"
BASE=https://storage.yandexcloud.net/yandex-research/ann-datasets/DEEP
wget -nc "$BASE/learn.350M.fbin" || true
wget -nc "$BASE/query.public.10K.fbin" || true
if [ "$1" = "--full" ]; then wget -nc "$BASE/base.1B.fbin"; fi
python fbin_to_fvecs.py learn.350M.fbin learn.fvecs
python fbin_to_fvecs.py query.public.10K.fbin deep1B_queries.fvecs
[ -f base.1B.fbin ] && python fbin_to_fvecs.py base.1B.fbin base.fvecs
echo "deep1b data ready (ground-truth ivecs from the reference release)"
