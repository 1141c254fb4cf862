#!/bin/sh
# Single-host TPU sweep job (the TPU-native analogue of the reference's
# hpc/miyabi.sh / hpc/tsubame.sh PBS/UGE single-node scripts: each job is
# an independent parameter sweep; multi-host sweeps are embarrassingly
# parallel across jobs).
set -eu
cd "$(dirname "$0")/.."
export BHS_TPU_JAX_CACHE="${BHS_TPU_JAX_CACHE:-$PWD/.jax_cache}"
python -m biem_helmholtz_sphere_tpu -v accuracy --mode k --branching-types a,ba \
    --k-max-log2 "${K_MAX_LOG2:-6}" --n-end-max-log2 "${N_END_MAX_LOG2:-7}"
python -m biem_helmholtz_sphere_tpu -v accuracy --mode n_balls --branching-types a \
    --n-balls-max-log4 "${N_BALLS_MAX_LOG4:-3}"
python -m biem_helmholtz_sphere_tpu plot-accuracy
