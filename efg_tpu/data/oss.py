"""Object-store (OSS/S3) listing helper (reference `efg/data/utils/oss.py:1-10`).

The reference lists dataset files through a petrel/oss client's
`get_file_iterator`; any client object with that method works here too.
No vendor SDK ships in this environment, so the client is injected by the
caller (e.g. an `oss2`/`boto3` adapter in deployment).
"""

from __future__ import annotations


def list_oss_dir(oss_path: str, client, with_info: bool = False):
    """List files under `oss_path` via `client.get_file_iterator`; returns
    a list of paths, or {path: info} when `with_info`."""
    files_iter = client.get_file_iterator(oss_path)
    if with_info:
        return {p: k for p, k in files_iter}
    return [p for p, k in files_iter]
