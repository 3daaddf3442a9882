"""Utility subsystem tests: logging config, tqdm selection, profiling."""



from arcadia_microscopy_tools_tpu.utils import configure_logging, get_tqdm
from arcadia_microscopy_tools_tpu.utils.profiling import StageTimer


class TestLogging:
    def test_configure_logging_runs(self):
        configure_logging(verbose=True)
        configure_logging(verbose=False)

    def test_get_tqdm_returns_callable(self):
        tqdm = get_tqdm()
        assert callable(tqdm)
        out = list(tqdm(range(3), disable=True)) if tqdm.__name__ != "_fallback_tqdm" else list(
            tqdm(range(3))
        )
        assert out == [0, 1, 2]


class TestStageTimer:
    def test_accumulates(self):
        timer = StageTimer()
        with timer.stage("a"):
            pass
        with timer.stage("a"):
            pass
        with timer.stage("b"):
            pass
        assert timer.counts["a"] == 2
        assert timer.counts["b"] == 1
        assert "a" in timer.report()

    def test_blocking_arg(self):
        import jax.numpy as jnp

        timer = StageTimer()
        x = jnp.ones((8, 8))
        with timer.stage("device", block=x * 2):
            pass
        assert timer.totals["device"] > 0

    def test_dump(self, tmp_path):
        timer = StageTimer()
        with timer.stage("x"):
            pass
        timer.dump(tmp_path / "t.json")
        assert (tmp_path / "t.json").exists()


class TestWarningsTaxonomy:
    def test_warning_classes(self):
        from arcadia_microscopy_tools_tpu.exceptions import (
            MetadataWarning,
            SegmentationWarning,
        )

        assert issubclass(MetadataWarning, UserWarning)
        assert issubclass(SegmentationWarning, UserWarning)
