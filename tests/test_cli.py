import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    JAX_PLATFORM_NAME="cpu",
    PYTHONPATH=REPO,
)


def run_dsp(args, timeout=110):
    return subprocess.run(
        [sys.executable, "-m", "dsp_tpu.cli.main"] + args,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def read_wav(path):
    from dsp_tpu.codecs import CodecParams, init_codec

    r = init_codec(CodecParams(path))
    y = r.read(10**7)
    info = (r.fs, r.channels)
    r.close()
    return y, info


class TestCliBasics:
    def test_sgen_to_wav(self, tmp_path):
        out = str(tmp_path / "o.wav")
        r = run_dsp(["-q", "-t", "sgen", "sine:freq=1k+0.2", "-o", "-t", "wav",
                     "-e", "double", out, "gain", "-6"])
        assert r.returncode == 0, r.stderr
        y, (fs, ch) = read_wav(out)
        assert fs == 44100 and ch == 1
        # sine samples don't land exactly on the crest: generous tolerance
        assert abs(np.abs(y).max() - 10 ** (-6 / 20)) < 1e-4

    def test_plot_mode(self):
        r = run_dsp(["-pn", "eq", "1k", "1.0", "+3"])
        assert r.returncode == 0
        assert "Ht0_mag_dB" in r.stdout
        assert "pause mouse close" in r.stdout

    def test_unknown_effect_error(self):
        # an unknown leading word is treated as another input path (like the
        # reference's IS_EFFECTS_CHAIN_START); a bogus word after a valid
        # effect is a chain error with a caret diagnostic
        r = run_dsp(["-n", "{", "bogus_effect", "}"])
        assert r.returncode != 0
        assert "no such effect" in r.stderr
        assert "^" in r.stderr

    def test_time_range(self, tmp_path):
        out = str(tmp_path / "o.wav")
        r = run_dsp(["-q", "-T", "0.1+0.05", "-t", "sgen", "sine:freq=1k+1",
                     "-o", "-t", "wav", "-e", "double", out, "gain", "0"])
        assert r.returncode == 0, r.stderr
        y, _ = read_wav(out)
        assert abs(len(y) - 0.05 * 44100) < 3

    def test_repeat(self, tmp_path):
        out = str(tmp_path / "o.wav")
        r = run_dsp(["-q", "-l1", "-t", "sgen", "sine:freq=1k+0.1",
                     "-o", "-t", "wav", "-e", "double", out, "gain", "0"])
        assert r.returncode == 0, r.stderr
        y, _ = read_wav(out)
        assert abs(len(y) - 0.2 * 44100) < 3

    def test_example_file(self, tmp_path):
        out = str(tmp_path / "o.wav")
        ex = os.path.join(REPO, "examples", "crossover_lr4_2kHz")
        r = run_dsp(["-q", "-t", "sgen", "-c", "2", "sine:freq=500+0.2",
                     "-o", "-t", "wav", "-e", "double", out, f"@{ex}"])
        assert r.returncode == 0, r.stderr
        y, (fs, ch) = read_wav(out)
        assert ch == 4

    def test_every_example_builds(self):
        """Every shipped example chain file (incl. the reference's matrix4
        direct_path variants) parses and compiles for a stereo stream."""
        import glob

        import numpy as np

        from dsp_tpu.chain import CompiledChain, build_chain_from_file
        from dsp_tpu.core.types import StreamInfo

        expect_ch = {
            "crossover_lr4_2kHz": 4,
            "crossover_lr4_2kHz_riir_linphase": 4,
            "eq_demo": 2,
            "matrix4_2_2": 4,
            "matrix4_2_4": 6,
            "matrix4_mb_2_2": 4,
            "matrix4_mb_2_4": 6,
            "matrix4_mb_direct_path_2_2": 4,
            "matrix4_mb_direct_path_2_4": 6,
        }
        files = sorted(glob.glob(os.path.join(REPO, "examples", "*")))
        assert len(files) == len(expect_ch)
        for path in files:
            name = os.path.basename(path)
            chain = build_chain_from_file(path, StreamInfo(44100, 2))
            assert chain.ostream.channels == expect_ch[name], name
            cc = CompiledChain(chain, block_frames=2048)
            y = np.asarray(cc.run_block(np.zeros((cc.block_frames, 2))))
            assert np.isfinite(y).all(), name

    def test_stats_output(self, tmp_path):
        r = run_dsp(["-q", "-t", "sgen", "sine:freq=1k+0.2", "-o", "-n", "stats"])
        assert r.returncode == 0, r.stderr
        assert "Peak level (dBFS)" in r.stderr
        assert "-3.01" in r.stderr or "-3.0103" in r.stderr


class TestCliInteractive:
    def test_quit_key(self, tmp_path):
        import pty
        import select
        import time

        out = str(tmp_path / "o.raw")
        cmd = [sys.executable, "-m", "dsp_tpu.cli.main", "-i", "-t", "sgen",
               "sine:freq=1k", "-o", "-t", "pcm", "-e", "double", out,
               "gain", "-6"]
        pid, fd = pty.fork()
        if pid == 0:
            os.environ.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu", PYTHONPATH=REPO)
            os.execvp(cmd[0], cmd)
        t0 = time.time()
        buf = b""
        quit_sent = False
        exited = False
        while time.time() - t0 < 100:
            r, _, _ = select.select([fd], [], [], 0.2)
            if r:
                try:
                    buf += os.read(fd, 65536)
                except OSError:
                    pass
            if not quit_sent and time.time() - t0 > 6:
                # wait until at least one block reached the file, so 'q'
                # can't win the race against a cold-cache first compile
                try:
                    produced = os.path.getsize(out) > 0
                except OSError:
                    produced = False
                if produced:
                    os.write(fd, b"q")
                    quit_sent = True
            done, _ = os.waitpid(pid, os.WNOHANG)
            if done:
                exited = True
                break
        if not exited:
            import signal

            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
        assert exited, "interactive dsp did not exit after 'q'"
        y = np.fromfile(out, "<f8")
        assert len(y) > 0  # infinite input: only 'q' ends the run


class TestCliSeek:
    def test_seek_keys_with_finite_input(self, tmp_path):
        """Drive ',' (back 5s) and '.' (forward 5s) through the pty: the
        output-buffer drop + latency compensation path (dsp.c:709-733)."""
        import pty
        import select
        import time

        out = str(tmp_path / "o.raw")
        cmd = [sys.executable, "-m", "dsp_tpu.cli.main", "-i", "-q", "-t", "sgen",
               "sine:freq=1k", "-o", "-t", "pcm", "-e", "double", out,
               "gain", "-6"]
        pid, fd = pty.fork()
        if pid == 0:
            os.environ.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu", PYTHONPATH=REPO)
            os.execvp(cmd[0], cmd)
        t0 = time.time()
        buf = b""
        sent = 0
        exited = False
        while time.time() - t0 < 100:
            r, _, _ = select.select([fd], [], [], 0.2)
            if r:
                try:
                    buf += os.read(fd, 65536)
                except OSError:
                    pass
            dt = time.time() - t0
            if sent == 0 and dt > 6:
                os.write(fd, b".")  # seek forward 5 s
                sent = 1
            elif sent == 1 and dt > 7:
                os.write(fd, b",")  # seek back 5 s
                sent = 2
            elif sent == 2 and dt > 8:
                os.write(fd, b"q")
                sent = 3
            done, _ = os.waitpid(pid, os.WNOHANG)
            if done:
                exited = True
                break
        if not exited:
            import signal

            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
        assert exited, "did not exit after seeks + q"
        y = np.fromfile(out, "<f8").reshape(-1, 1)
        assert len(y) > 0
        assert np.isfinite(y).all()


class TestCliAbx:
    def test_abx_two_trials(self, tmp_path):
        import pty
        import re
        import select
        import time

        a = tmp_path / "a.raw"
        b = tmp_path / "b.raw"
        t = np.arange(44100) / 44100.0
        xa = 0.3 * np.sin(2 * np.pi * 440 * t)
        np.stack([xa, xa], 1).astype("<f8").tofile(a)
        np.stack([0.25 * xa / 0.3] * 2, 1).astype("<f8").tofile(b)
        cmd = [sys.executable, "-m", "dsp_tpu.cli.main", "-q", "-X2",
               "-t", "pcm", "-e", "double", "-r", "44100", "-c", "2", str(a),
               "-t", "pcm", "-e", "double", "-r", "44100", "-c", "2", str(b),
               "-o", "-t", "null", "null", "gain", "0"]
        pid, fd = pty.fork()
        if pid == 0:
            os.environ.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu", PYTHONPATH=REPO)
            os.execvp(cmd[0], cmd)
        buf = b""
        answered = 0
        t0 = time.time()
        exited = False
        while time.time() - t0 < 120:
            r, _, _ = select.select([fd], [], [], 0.2)
            if r:
                try:
                    buf += os.read(fd, 65536)
                except OSError:
                    pass
            trials = len(set(re.findall(rb"ABX trial (\d+)", buf)))
            if trials > answered:
                time.sleep(0.5)
                os.write(fd, b"A")
                time.sleep(0.2)
                os.write(fd, b"\n")
                answered += 1
            done, _ = os.waitpid(pid, os.WNOHANG)
            if done:
                exited = True
                break
        if not exited:
            import signal

            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
        assert exited, buf[-400:]
        m = re.search(rb"ABX result: (\d+) correct out of 2 \(p=", buf)
        assert m, buf[-400:]


class TestReviewRegressions:
    def test_hash_initial_argv_word(self, tmp_path):
        """A '#'-initial argv word is ONE verbatim token in the reference
        (ec_lex_word, effects_chain.c:79-103); pre-fix the argv join
        re-lexed it as a comment, silently dropping the rest of the chain."""
        from dsp_tpu.chain import build_chain_from_args
        from dsp_tpu.codecs import CodecParams, init_codec
        from dsp_tpu.codecs.base import CODEC_MODE_WRITE
        from dsp_tpu.core.types import StreamInfo

        w = init_codec(CodecParams(str(tmp_path / "#taps.wav"), type="wav",
                                   enc="double", fs=44100, channels=1,
                                   mode=CODEC_MODE_WRITE))
        w.write(np.array([[0.5], [0.25], [0.125]]))
        w.close()
        c = build_chain_from_args(["fir", "#taps.wav", "gain", "-3"],
                                  StreamInfo(44100, 1), dir_=str(tmp_path))
        assert [e.name for e in c.effects] == ["fir", "gain"]

    def test_offline_output_length_floor_rule(self, tmp_path):
        """run_offline's final-chunk trim must keep floor(n*ratio) frames,
        matching CompiledChain.process_array exactly (pre-fix it kept
        ceil(n*ratio), one spurious frame for fractional ratios)."""
        from dsp_tpu.chain import CompiledChain, build_chain_from_string
        from dsp_tpu.core.types import StreamInfo

        n_in = 10007  # prime: guarantees fractional products
        x = np.sin(2 * np.pi * 997 * np.arange(n_in) / 44100) * 0.4
        raw_in = str(tmp_path / "i.raw")
        x.astype(np.float64).tofile(raw_in)
        out = str(tmp_path / "o.raw")
        r = run_dsp(["-q", "-r", "44100", "-c", "1", "-t", "pcm", "-e", "double",
                     raw_in, "-o", "-t", "pcm", "-e", "double", out,
                     "resample", "48k"])
        assert r.returncode == 0, r.stderr
        y_cli = np.fromfile(out, dtype=np.float64)
        chain = build_chain_from_string("resample 48k", StreamInfo(44100, 1))
        cc = CompiledChain(chain, block_frames=2048)
        y_lib = cc.process_array(x[:, None])
        assert len(y_cli) == len(y_lib), (len(y_cli), len(y_lib))

    def test_sequence_mode_reopen_finalizes_output(self, tmp_path):
        """-S with a format change: the writer must drain BEFORE the old
        output codec closes, and the FINAL codec must be closed/finalized
        (pre-fix: tail blocks went to a closed codec and the reopened wav
        was never finalized)."""
        out = str(tmp_path / "o.wav")
        r = run_dsp(["-q", "-S",
                     "-r", "44100", "-t", "sgen", "sine:freq=997+0.2",
                     "-r", "48000", "-t", "sgen", "sine:freq=1.3k+0.25",
                     "-o", "-t", "wav", "-e", "double", out])
        assert r.returncode == 0, r.stderr
        y, (fs, ch) = read_wav(out)
        # the reopen truncates (documented reference behavior): the file
        # holds the SECOND group at its rate, fully written
        assert fs == 48000 and ch == 1
        assert abs(len(y) - int(0.25 * 48000)) <= 2
        assert np.abs(y).max() > 0.5
