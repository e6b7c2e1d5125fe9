"""Terraform surface sanity. Full `terraform validate` needs the
hashicorp/kubernetes provider, which is not in this environment's
offline plugin mirror (/opt/tf-plugins has only aws) — so CI checks
syntax/style via `terraform fmt -check` and falls back gracefully if
the binary is missing. The module graph mirrors the reference stack:
minio + engine(Thrift) + superset/redis/postgres BI tier
(reference: tf/main.tf, tf/superset/superset.tf)."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

TF_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "infra", "terraform")


@pytest.mark.skipif(shutil.which("terraform") is None, reason="terraform not installed")
def test_terraform_fmt_clean():
    proc = subprocess.run(
        ["terraform", "fmt", "-check", "-recursive"],
        cwd=TF_DIR, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, f"terraform fmt violations:\n{proc.stdout}{proc.stderr}"


def test_bi_tier_wired_to_thrift_endpoint():
    """The superset module must import the engine as a hive:// (Spark
    Thrift / HiveServer2) database — the reference's trino://trino:80
    sqlalchemy_uri analog."""
    with open(os.path.join(TF_DIR, "modules", "superset", "main.tf")) as f:
        src = f.read()
    assert "sqlalchemy_uri: hive://" in src
    assert "allow_dml: true" in src  # reference: superset.tf:57
    with open(os.path.join(TF_DIR, "main.tf")) as f:
        root = f.read()
    assert 'module "superset"' in root
