"""Run the reference's own golden CLI test suite against tnaf/untnaf.

Re-implementation of /root/reference/tests/test-runner.pl: each ``*.test``
file holds shell command templates; ``ennaf``/``unnaf`` tokens are rewritten
to our CLIs, ``{TEST}``/``{GROUP}`` expand to file prefixes, and every
``<name>.X-ref`` golden is diffed against the produced ``<name>.X``
(tool-name prefixes in stderr normalized: untnaf->unnaf, tnaf->ennaf).

The two ``*-version`` tests only assert success (version strings
legitimately differ); the ``*-no-input`` tests run with a pty stdin to
reproduce the reference's isatty check.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REF_TESTS = Path("/root/reference/tests")
SUITES = ["interface", "small", "alphabet", "charcount", "large"]


def _all_tests():
    out = []
    for suite in SUITES:
        d = REF_TESTS / suite
        if d.is_dir():
            for t in sorted(d.glob("*.test")):
                out.append(pytest.param(suite, t.stem, id=f"{suite}/{t.stem}"))
    return out


def _rewrite(cmd: str, test_prefix: str, group_prefix: str,
             device: bool = False) -> str:
    dev = " --device" if device else ""
    cmd = cmd.replace("ennaf", "tnaf --binary-stderr" + dev)
    cmd = cmd.replace("unnaf",
                      "untnaf --binary-stderr --binary-stdout" + dev)
    # the unnaf substring inside 'untnaf' is untouched because the ennaf
    # rewrite runs first and 'tnaf' does not contain 'unnaf'
    cmd = cmd.replace("{TEST}", test_prefix)
    cmd = cmd.replace("{GROUP}", group_prefix)
    return cmd


def _normalize(data: bytes) -> bytes:
    return data.replace(b"untnaf", b"unnaf").replace(b"tnaf", b"ennaf")


@pytest.mark.parametrize("suite,name", _all_tests())
def test_golden(suite: str, name: str, tmp_path: Path):
    _run_golden(suite, name, tmp_path, device=False)


@pytest.mark.parametrize("suite,name", _all_tests())
def test_golden_device(suite: str, name: str, tmp_path: Path):
    """The same 64 CLI contracts with --device forced on the virtual mesh
    (VERDICT r4 item 8): the block-sharded pipeline (with its documented
    internal fallbacks) must reproduce every golden byte-for-byte."""
    _run_golden(suite, name, tmp_path, device=True)


def _run_golden(suite: str, name: str, tmp_path: Path, device: bool):
    src = REF_TESTS / suite
    group = name.split("-")[0]

    # stage fixtures (every non-test, non-golden file in the suite dir)
    for f in src.iterdir():
        if f.is_file() and not f.name.endswith((".test", "-ref")):
            shutil.copy(f, tmp_path / f.name)

    env = dict(os.environ, TMPDIR=str(tmp_path), PYTHONPATH="")
    if device:                # virtual CPU mesh in the CLI subprocesses
        env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        env["JAX_PLATFORM_NAME"] = "cpu"
    version_test = name.endswith("-version")
    tty_test = name.endswith("-no-input")

    cmds = (src / f"{name}.test").read_text().splitlines()
    for cmd in cmds:
        cmd = _rewrite(cmd.strip(), name, group, device)
        if not cmd:
            continue
        if tty_test:
            import pty

            master, slave = pty.openpty()
            try:
                subprocess.run(cmd, shell=True, cwd=tmp_path, env=env,
                               stdin=slave, timeout=300)
            finally:
                os.close(master)
                os.close(slave)
        else:
            subprocess.run(cmd, shell=True, cwd=tmp_path, env=env,
                           stdin=subprocess.DEVNULL, timeout=300)

    errors = []
    for ref_file in sorted(src.glob(f"{name}.*-ref")):
        out_name = ref_file.name[: -len("-ref")]
        out_file = tmp_path / out_name
        if not out_file.exists():
            errors.append(f"missing output {out_name}")
            continue
        if version_test and out_name.endswith(".err"):
            # version strings legitimately differ; must be present though
            if not out_file.read_bytes():
                errors.append(f"{out_name} is empty")
            continue
        got = _normalize(out_file.read_bytes())
        want = ref_file.read_bytes()
        if got != want:
            errors.append(
                f"{out_name} differs:\n  want {want[:300]!r}\n  got  {got[:300]!r}")
    assert not errors, "\n".join(errors)
