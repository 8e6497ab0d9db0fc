"""Test configuration.

Tests run on the CPU backend with a virtual 8-device mesh so that all
sharding/multi-chip code paths are exercised without TPU hardware
(SURVEY.md section 4 implication: multi-host tests via
``xla_force_host_platform_device_count``).
"""

import os

# SEQALIGN_TPU=1 runs on the real device instead of the virtual CPU mesh —
# intended for the env-gated full-scale tests (test_differential.py's 32k
# run); the 8-device sharding tests require the CPU mesh and will fail.
_USE_TPU = bool(os.environ.get("SEQALIGN_TPU"))

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # the axon harness pins jax_platforms to the TPU tunnel via
    # sitecustomize; env vars alone don't override it — force the config.
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"
CRP_SEQ = f"{REFERENCE}/amos/small/crp177.seq"
CRP_OVL = f"{REFERENCE}/amos/small/crp177.ovl"
CRP_FASTA = f"{REFERENCE}/amos/small/crp177.fasta"
HOXD1 = f"{REFERENCE}/amos/HOXD1.txt"
HOXD2 = f"{REFERENCE}/amos/HOXD2.txt"


@pytest.fixture(scope="session")
def crp_seqs():
    from sequence_aligner_tpu.io.fasta import read_fasta

    return read_fasta(CRP_SEQ)


@pytest.fixture(scope="session")
def golden_records():
    from sequence_aligner_tpu.io.ovl import parse_ovl

    return parse_ovl(CRP_OVL)
