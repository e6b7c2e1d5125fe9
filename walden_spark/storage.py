"""Object-store bucket utilities (SURVEY.md §7.1 M0).

The reference manages buckets out-of-band with the MinIO client before
any DDL runs (reference: tf/test-hive.sh:6-12 — ``mc alias`` / ``mc rb
--force`` / ``mc mb``; README.md:96-101). Spark never creates buckets,
so the engine ships the same capability as a thin client shim:

* S3/MinIO path (``s3://`` / ``s3a://``) via boto3 when available
  (gated behind an import-try — not bundled in every runtime);
* local-filesystem path for tests and single-node runs, where a
  "bucket" is a directory.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from urllib.parse import urlparse

try:  # boto3 is optional; local-FS mode needs nothing
    import boto3  # type: ignore
except ImportError:  # pragma: no cover
    boto3 = None


def _parse(url: str):
    u = urlparse(url)
    if u.scheme in ("s3", "s3a", "s3n"):
        return "s3", u.netloc, u.path.lstrip("/")
    if u.scheme in ("", "file"):
        return "file", "", (u.path or url)
    raise ValueError(f"unsupported storage url: {url}")


def _s3(endpoint: str | None, access_key: str | None, secret_key: str | None):
    if boto3 is None:
        raise RuntimeError("boto3 not installed — S3 bucket ops unavailable")
    return boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id=access_key,
        aws_secret_access_key=secret_key,
    )


def ensure_bucket(url: str, endpoint=None, access_key=None, secret_key=None) -> None:
    """``mc mb`` equivalent (reference: tf/test-hive.sh:11-12)."""
    kind, bucket, path = _parse(url)
    if kind == "file":
        Path(path).mkdir(parents=True, exist_ok=True)
        return
    client = _s3(endpoint, access_key, secret_key)
    try:
        client.head_bucket(Bucket=bucket)
    except Exception:
        client.create_bucket(Bucket=bucket)


def drop_bucket(url: str, force: bool = True, endpoint=None, access_key=None, secret_key=None) -> None:
    """``mc rb --force`` equivalent (reference: tf/test-hive.sh:9-10)."""
    kind, bucket, path = _parse(url)
    if kind == "file":
        shutil.rmtree(path, ignore_errors=True)
        return
    client = _s3(endpoint, access_key, secret_key)
    if force:
        paginator = client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket):
            keys = [{"Key": o["Key"]} for o in page.get("Contents", [])]
            if keys:
                client.delete_objects(Bucket=bucket, Delete={"Objects": keys})
    client.delete_bucket(Bucket=bucket)


def list_objects(url: str, endpoint=None, access_key=None, secret_key=None) -> list[str]:
    """``mc ls -r`` equivalent (reference: tf/test-hive.sh:27) — used by
    the smoke test to assert data files landed under the location."""
    kind, bucket, path = _parse(url)
    if kind == "file":
        root = Path(path)
        return sorted(str(p.relative_to(root)) for p in root.rglob("*") if p.is_file())
    client = _s3(endpoint, access_key, secret_key)
    out: list[str] = []
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=path):
        out.extend(o["Key"] for o in page.get("Contents", []))
    return sorted(out)
