#!/bin/bash
# Single-node SLURM submit wrapper (reference openvqe/bash_files/*.sh are six
# per-main sbatch one-liners; this parametrizes the main to run).
#
# Usage: sbatch scripts/submit_slurm.sh main_fermionic_adapt
#SBATCH -c 6
#SBATCH --mem=16G
#SBATCH -t 12:00:00

MAIN=${1:-main_ucc}
cd "$(dirname "$0")/.."
time python -m openvqe_tpu.mains.${MAIN}
