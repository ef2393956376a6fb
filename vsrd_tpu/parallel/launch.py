"""Multi-host launchers.

Replaces the reference's Slurm/MPI launcher
(`/root/reference/vsrd/distributed/slurm/launch.py`): on TPU pods the
runtime rendezvous is jax.distributed's job, so launching reduces to
starting the same command on every host. Two paths:

* ``tpu-vm``: shells out to ``gcloud compute tpus tpu-vm ssh --worker=all``;
* ``slurm``: builds an ``srun`` command (CPU/GPU clusters driving
  TPU-over-network setups, or for parity with the reference CLI).

Usage:
    python -m vsrd_tpu.parallel.launch --launcher tpu-vm --tpu my-pod \
        -- python scripts/main.py --config ... --train
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys


def tpu_vm_command(args, command):
    inner = " ".join(map(shlex.quote, command))
    return [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", args.tpu,
        f"--zone={args.zone}",
        "--worker=all",
        f"--command=cd {shlex.quote(args.workdir)} && {inner}",
    ]


def slurm_command(args, command):
    return [
        "srun",
        f"--partition={args.partition}",
        f"--nodes={args.num_nodes}",
        f"--ntasks-per-node={args.num_tasks_per_node}",
        "--mpi=none",
        *command,
    ]


def main():
    parser = argparse.ArgumentParser(description="vsrd_tpu multi-host launcher")
    parser.add_argument("--launcher", choices=["tpu-vm", "slurm"],
                        default="tpu-vm")
    parser.add_argument("--tpu", type=str, default=None)
    parser.add_argument("--zone", type=str, default="us-central1-a")
    parser.add_argument("--workdir", type=str, default=".")
    parser.add_argument("--partition", type=str, default=None)
    parser.add_argument("--num_nodes", type=int, default=1)
    parser.add_argument("--num_tasks_per_node", type=int, default=1)
    parser.add_argument("--dry_run", action="store_true")
    parser.add_argument("command", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    command = args.command
    if command and command[0] == "--":
        command = command[1:]
    if not command:
        parser.error("no command given (append: -- python scripts/main.py ...)")

    full = (
        tpu_vm_command(args, command)
        if args.launcher == "tpu-vm"
        else slurm_command(args, command)
    )
    print(" ".join(map(shlex.quote, full)))
    if not args.dry_run:
        sys.exit(subprocess.call(full))


if __name__ == "__main__":
    main()
