#!/bin/bash
# Download the BigANN (SIFT1B) dataset into data/bigann/.
# Mirrors the reference repo's data acquisition step; files are the
# standard irisa.fr distribution (bvecs + ground truth).
set -e
cd "$(dirname "$0")"
BASE=ftp://ftp.irisa.fr/local/texmex/corpus
for f in bigann_learn.bvecs.gz bigann_query.bvecs.gz bigann_gnd.tar.gz; do
    [ -f "${f%.gz}" ] || [ -f "$f" ] || wget "$BASE/$f"
done
# Full 1B base vectors are ~100GB; pass --full to fetch them.
if [ "$1" = "--full" ]; then
    [ -f bigann_base.bvecs ] || wget "$BASE/bigann_base.bvecs.gz"
fi
for f in *.gz; do [ -f "$f" ] && gunzip -k "$f"; done
[ -f bigann_gnd.tar ] && tar -xf bigann_gnd.tar && mkdir -p gnd && mv idx_*.ivecs dis_*.fvecs gnd/ 2>/dev/null || true
echo "bigann data ready"
