"""Multi-host launch env resolution (reference `efg/engine/launch.py:31-182`
semantics: explicit flags > SLURM env > torchrun-style env)."""

import types

from cli.main import _slurm_first_host, resolve_distributed_env


def _args(num_machines=1, machine_rank=0, dist_url=None):
    return types.SimpleNamespace(
        num_machines=num_machines, machine_rank=machine_rank, dist_url=dist_url
    )


def test_slurm_first_host():
    assert _slurm_first_host("node01") == "node01"
    assert _slurm_first_host("node01,node02") == "node01"
    assert _slurm_first_host("node[001-004]") == "node001"
    assert _slurm_first_host("node[3,7-9]") == "node3"
    assert _slurm_first_host("gpu[12]a,gpu[13]a") == "gpu12a"
    assert _slurm_first_host("a[1-2],b[3-4]") == "a1"


def test_single_process_default():
    assert resolve_distributed_env(_args(), {}) is None
    # SLURM single task → single process
    env = {"SLURM_PROCID": "0", "SLURM_NTASKS": "1", "SLURM_NODELIST": "n1"}
    assert resolve_distributed_env(_args(), env) is None
    assert resolve_distributed_env(_args(), {"RANK": "0", "WORLD_SIZE": "1"}) is None


def test_explicit_flags_win():
    env = {"SLURM_PROCID": "3", "SLURM_NTASKS": "8", "SLURM_NODELIST": "n[1-8]"}
    got = resolve_distributed_env(
        _args(num_machines=2, machine_rank=1, dist_url="h:1234"), env
    )
    assert got == ("h:1234", 2, 1)


def test_slurm_env():
    env = {
        "SLURM_PROCID": "3", "SLURM_NTASKS": "8",
        "SLURM_NODELIST": "node[017-024]",
    }
    assert resolve_distributed_env(_args(), env) == ("node017:29500", 8, 3)
    env["MASTER_PORT"] = "12355"
    assert resolve_distributed_env(_args(), env) == ("node017:12355", 8, 3)
    env["MASTER_ADDR"] = "10.0.0.1"
    assert resolve_distributed_env(_args(), env) == ("10.0.0.1:12355", 8, 3)


def test_torchrun_env():
    env = {"RANK": "2", "WORLD_SIZE": "4", "MASTER_ADDR": "w0", "MASTER_PORT": "5"}
    assert resolve_distributed_env(_args(), env) == ("w0:5", 4, 2)
