#!/bin/sh
# Reproduce the jascome paper tables (reference: justfile / hpc jobs).
set -eu
cd "$(dirname "$0")/.."
python -m biem_helmholtz_sphere_tpu -v jascome
python -m biem_helmholtz_sphere_tpu jascome-clean
