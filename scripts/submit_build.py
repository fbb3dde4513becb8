"""`ray job submit` entrypoint for the distributed index build.

The north rule's deployment shape — the whole job runs on a fixed-size
multi-node Ray cluster via the Ray Jobs API:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python scripts/submit_build.py \
           s3://bucket/corpus/ /shared/index     \
           --partitions 65536 --tokenizer code

In-cluster, the job runtime sets ``RAY_ADDRESS`` and ``ray.init()``
attaches to the running cluster; standalone (this sandbox, CI) the same
script runs against a local session.  The build is resumable — re-submit
the identical command after a failure and only dirty partitions rerun
(manifest checkpoint, see ``coderag_ray/index/manifest.py``).

Exit code 0 + one JSON line (the BuildReport, incl. per-partition
counts in the manifest) on success — parseable by a scheduler.
"""

from __future__ import annotations

import sys

from coderag_ray.cli import main

if __name__ == "__main__":
    sys.exit(main(["build", *sys.argv[1:]]))
