#!/bin/bash
# Multi-host launcher example (replaces the reference's run.sh accelerate
# launcher). On Cloud TPU pods, JAX auto-detects the topology and none of
# the QINCO_* variables are needed — just run the same command on every
# host. For generic clusters:
#
#   ./run_multihost.sh <num_hosts> <host_index> <coordinator:port> task=train ...
set -e
NUM=$1; IDX=$2; COORD=$3; shift 3
QINCO_COORDINATOR=$COORD QINCO_NUM_PROCS=$NUM QINCO_PROC_ID=$IDX \
    exec python run_qinco.py "$@"
