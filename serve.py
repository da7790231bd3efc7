#!/usr/bin/env python
"""Repo-root shim for the multi-host serving entry point (the ``serve.py``
named by the runbook in ``llama_swift_tpu/parallel/multihost.py``)."""
import sys

from llama_swift_tpu.serve import main

if __name__ == "__main__":
    sys.exit(main())
