#!/bin/bash
# Contriever wiki embeddings (as used by the QINCo papers).
# The reference hosts prepared .npy splits; regenerate them by embedding
# the wikipedia passages with facebook/contriever and saving:
#   database1M.npy training_set.npy queries.npy ground_truth1M.npy
set -e
cd "$(dirname "$0")"
echo "Prepare contriever embeddings with the facebook/contriever encoder"
echo "and place database1M.npy / training_set.npy / queries.npy /"
echo "ground_truth1M.npy in this directory."
