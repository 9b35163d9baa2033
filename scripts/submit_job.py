"""Submit the dedup pipeline as a Ray job — the north rule's stated
deployment surface (``ray job submit`` on a fixed-size multi-node
cluster).

Uses the public Ray Job Submission SDK
(``ray.job_submission.JobSubmissionClient``): the repo ships as the
job's ``working_dir`` so every worker imports the same code, and the
entrypoint is the package CLI (``python -m simhash_ray dedup ...``),
which attaches to the cluster's existing Ray session (the CLI only
calls ``ray.init`` when no session exists).

Cluster use:

    python scripts/submit_job.py --address http://<head>:8265 \
        -- dedup /data/images --out /data/out --ckpt /data/ckpt --shards 1024

Local smoke (no cluster / dashboard in this sandbox — runs the same
entrypoint in a subprocess so the packaging path stays testable):

    python scripts/submit_job.py --local -- dedup /tmp/images --out /tmp/out
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_entrypoint(cli_args: list[str]) -> str:
    return " ".join(["python", "-m", "simhash_ray", *cli_args])


def submit(address: str, cli_args: list[str], follow: bool = True) -> str:
    from ray.job_submission import JobStatus, JobSubmissionClient

    client = JobSubmissionClient(address)
    job_id = client.submit_job(
        entrypoint=build_entrypoint(cli_args),
        runtime_env={
            "working_dir": REPO_ROOT,
            # keep checkpoints/bench scratch out of the uploaded package
            "excludes": [".git", "__pycache__", "*.parquet"],
        },
    )
    print(f"submitted {job_id} to {address}")
    if follow:
        terminal = {JobStatus.SUCCEEDED, JobStatus.FAILED, JobStatus.STOPPED}
        while (status := client.get_job_status(job_id)) not in terminal:
            time.sleep(5)
        print(client.get_job_logs(job_id))
        print(f"job {job_id} finished: {status}")
        if status is not JobStatus.SUCCEEDED:
            raise SystemExit(1)
    return job_id


def run_local(cli_args: list[str]) -> None:
    """Sandbox stand-in: same entrypoint, subprocess instead of a job."""
    cmd = build_entrypoint(cli_args).split()
    print(f"(local) {' '.join(cmd)}")
    subprocess.run(cmd, check=True, cwd=REPO_ROOT)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument(
        "--address",
        default=os.environ.get("RAY_JOB_ADDRESS", "http://127.0.0.1:8265"),
        help="Ray dashboard/job-server address (default: $RAY_JOB_ADDRESS)",
    )
    p.add_argument(
        "--local",
        action="store_true",
        help="run the entrypoint in a local subprocess instead of submitting",
    )
    p.add_argument("--no-follow", action="store_true", help="submit and exit")
    p.add_argument(
        "cli_args",
        nargs=argparse.REMAINDER,
        help="arguments after -- are passed to `python -m simhash_ray`",
    )
    args = p.parse_args()
    cli = [a for a in args.cli_args if a != "--"]
    if not cli:
        p.error("no CLI arguments given (e.g. -- dedup <table> --out DIR)")
    if args.local:
        run_local(cli)
    else:
        submit(args.address, cli, follow=not args.no_follow)


if __name__ == "__main__":
    main()
