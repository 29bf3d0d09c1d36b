"""run_cmd error-pattern scanning + contextual allowlist tests
(reference pixie/utils.py:108-223 semantics)."""

import sys

import pytest

from pixie_tpu.utils.proc import CommandError, _is_allowlisted_noise, run_cmd


def _py(snippet: str):
    return [sys.executable, "-c", snippet]


class TestRunCmd:
    def test_success_returns_output(self):
        out = run_cmd(_py("print('hello world')"), echo=False)
        assert "hello world" in out

    def test_nonzero_exit_raises(self):
        with pytest.raises(CommandError, match="rc=3"):
            run_cmd(_py("import sys; sys.exit(3)"), echo=False)

    def test_error_pattern_raises_despite_rc0(self):
        with pytest.raises(CommandError, match="Traceback"):
            run_cmd(_py("print('Traceback (most recent call last)')"),
                    echo=False)

    def test_allow_error_suppresses(self):
        out = run_cmd(_py("import sys; sys.exit(1)"), allow_error=True,
                      echo=False)
        assert out == ""

    def test_line_whitelist(self):
        # a whitelisted line containing an error pattern does not abort
        out = run_cmd(_py(
            "print('RuntimeError: add-on not loaded')"), echo=False)
        assert "add-on" in out


class TestContextualAllowlist:
    def test_gs_addon_noise_with_success_forgiven(self):
        text = ("Exception in module unregister():\n"
                "RuntimeError: boom\nVideo saved to /x/y.mp4\n")
        assert _is_allowlisted_noise(text)

    def test_gs_addon_noise_without_success_not_forgiven(self):
        assert not _is_allowlisted_noise("Exception in module unregister():\n")

    def test_blendernerf_noise_with_success_forgiven(self):
        assert _is_allowlisted_noise(
            "BlenderNeRF Camera not found\nBlender quit\n")

    def test_unrelated_error_not_forgiven(self):
        assert not _is_allowlisted_noise("RuntimeError: real failure\n")

    def test_run_cmd_forgives_allowlisted_combo(self):
        out = run_cmd(_py(
            "print('Exception in module unregister():');"
            "print('Video saved to /tmp/x.mp4')"), echo=False)
        assert "Video saved" in out
