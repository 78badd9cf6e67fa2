"""Checkpoint/resume: a host restart mid-stream must reproduce the
uninterrupted run exactly (SURVEY.md §5)."""

import numpy as np

from pbmm_tpu.config import MagnifyConfig, TemporalConfig
from pbmm_tpu.engine.state import load_state, save_state
from pbmm_tpu.engine.video import magnify_video
from pbmm_tpu.oracle.synthetic import oscillating_gaussian_blob


def _roundtrip(cfg, tmp_path):
    clip = oscillating_gaussian_blob(height=32, width=32, frames=10)
    whole, _ = magnify_video(clip, cfg)

    first, st = magnify_video(clip[:5], cfg)
    save_state(st, str(tmp_path / "ckpt.npz"))
    st2 = load_state(str(tmp_path / "ckpt.npz"))
    assert int(st2.frame_idx) == int(st.frame_idx)
    rest, _ = magnify_video(clip[5:], cfg, state=st2)

    resumed = np.concatenate([np.asarray(first), np.asarray(rest)])
    np.testing.assert_allclose(resumed, np.asarray(whole), atol=1e-5)


def test_resume_two_frame(tmp_path):
    _roundtrip(MagnifyConfig(), tmp_path)


def test_resume_iir(tmp_path):
    _roundtrip(
        MagnifyConfig(
            temporal=TemporalConfig(mode="iir_bandpass", low_hz=0.5,
                                    high_hz=4.0, fps=30.0)
        ),
        tmp_path,
    )


def test_resume_nocache_mode(tmp_path):
    _roundtrip(MagnifyConfig(cache_prev_spectrum=False), tmp_path)


class TestDriverResumeLoop:
    """The driver-level failure-recovery loop (`stream_magnify_resumable`):
    output written incrementally, state checkpointed atomically per chunk,
    a killed run resumed by re-running the same command."""

    def _clip(self, tmp_path, frames=12):
        clip = oscillating_gaussian_blob(height=32, width=32, frames=frames)
        p = tmp_path / "in.npy"
        np.save(p, clip)
        return clip, str(p)

    def test_uninterrupted_equals_plain_engine(self, tmp_path):
        from pbmm_tpu.io.stream import stream_magnify_resumable

        clip, inp = self._clip(tmp_path)
        outp = str(tmp_path / "out.npy")
        cfg = MagnifyConfig()
        n = stream_magnify_resumable(inp, outp, cfg, chunk_frames=4,
                                     checkpoint=str(tmp_path / "ck.npz"))
        assert n == 12
        whole, _ = magnify_video(clip, cfg)
        np.testing.assert_allclose(np.load(outp), np.asarray(whole),
                                   atol=1e-5)

    def test_kill_and_resume_bit_identical(self, tmp_path):
        from pbmm_tpu.io.stream import stream_magnify_resumable

        clip, inp = self._clip(tmp_path)
        cfg = MagnifyConfig()
        ck = str(tmp_path / "ck.npz")
        out_i = str(tmp_path / "interrupted.npy")
        out_u = str(tmp_path / "uninterrupted.npy")

        # Uninterrupted reference run.
        stream_magnify_resumable(inp, out_u, cfg, chunk_frames=4,
                                 checkpoint=str(tmp_path / "ck_u.npz"))

        # "Kill" after one chunk (the fault-injection hook stops exactly
        # where SIGKILL between two chunk boundaries would).
        n1 = stream_magnify_resumable(inp, out_i, cfg, chunk_frames=4,
                                      checkpoint=ck, max_chunks=1)
        assert n1 == 4
        st = load_state(ck)
        assert int(st.frame_idx) == 4

        # Torn tail: the crash may have left garbage in not-yet-checkpointed
        # output frames; resume must rewrite everything past frame_idx.
        mm = np.lib.format.open_memmap(out_i, mode="r+")
        mm[4:] = 123.0
        mm.flush()
        del mm

        # Resume = re-run the same command.
        n2 = stream_magnify_resumable(inp, out_i, cfg, chunk_frames=4,
                                      checkpoint=ck)
        assert n2 == 12
        np.testing.assert_array_equal(np.load(out_i), np.load(out_u))

    def test_resume_noop_when_complete(self, tmp_path):
        from pbmm_tpu.io.stream import stream_magnify_resumable

        clip, inp = self._clip(tmp_path, frames=8)
        cfg = MagnifyConfig()
        ck = str(tmp_path / "ck.npz")
        outp = str(tmp_path / "out.npy")
        stream_magnify_resumable(inp, outp, cfg, chunk_frames=4,
                                 checkpoint=ck)
        before = np.load(outp).copy()
        n = stream_magnify_resumable(inp, outp, cfg, chunk_frames=4,
                                     checkpoint=ck)
        assert n == 8
        np.testing.assert_array_equal(np.load(outp), before)

    def test_wrong_chunk_size_rejected(self, tmp_path):
        import pytest

        from pbmm_tpu.io.stream import stream_magnify_resumable

        clip, inp = self._clip(tmp_path)
        cfg = MagnifyConfig()
        ck = str(tmp_path / "ck.npz")
        outp = str(tmp_path / "out.npy")
        stream_magnify_resumable(inp, outp, cfg, chunk_frames=4,
                                 checkpoint=ck, max_chunks=1)
        with pytest.raises(ValueError, match="chunk_frames"):
            stream_magnify_resumable(inp, outp, cfg, chunk_frames=3,
                                     checkpoint=ck)

    def test_cli_stream_checkpoint_resume(self, tmp_path):
        from pbmm_tpu.cli import main

        clip, inp = self._clip(tmp_path)
        outp = str(tmp_path / "out.npy")
        ck = str(tmp_path / "ck.npz")
        rc = main(["--input", inp, "--output", outp, "--stream",
                   "--chunk-frames", "4", "--checkpoint", ck])
        assert rc == 0
        st = load_state(ck)
        assert int(st.frame_idx) == 12
        whole, _ = magnify_video(clip, MagnifyConfig())
        np.testing.assert_allclose(np.load(outp), np.asarray(whole),
                                   atol=1e-5)


def test_resumable_planar_u8_layout(tmp_path):
    """r5: the resumable driver's preallocated memmap follows the
    configured output layout (planar uint8 here) and kill/resume stays
    bit-identical."""
    import numpy as np

    from pbmm_tpu.config import MagnifyConfig
    from pbmm_tpu.engine.video import magnify_video
    from pbmm_tpu.io.stream import stream_magnify_resumable

    rng = np.random.default_rng(0)
    clip = np.stack([
        np.roll(rng.random((24, 32, 3)).astype(np.float32), i, axis=1)
        for i in range(8)
    ])
    inp = str(tmp_path / "in.npy")
    np.save(inp, clip)
    outp = str(tmp_path / "out.npy")
    ck = str(tmp_path / "state.npz")
    cfg = MagnifyConfig(phase_scale=5.0, output_layout="planar_u8")

    n1 = stream_magnify_resumable(inp, outp, cfg, chunk_frames=2,
                                  checkpoint=ck, max_chunks=2)
    assert n1 == 4
    n2 = stream_magnify_resumable(inp, outp, cfg, chunk_frames=2,
                                  checkpoint=ck)
    assert n2 == 8
    got = np.load(outp)
    assert got.dtype == np.uint8 and got.shape == (8, 3, 24, 32)
    ref, _ = magnify_video(clip, cfg)
    np.testing.assert_array_equal(got, np.asarray(ref))
