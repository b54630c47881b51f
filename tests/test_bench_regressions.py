"""bench.py regression detection: the guard that keeps a perf drift from
shipping silently inside one opaque headline number (it did in round 4:
fit 1.07 -> 1.39 s/image behind a green bench line)."""
import json

import bench


def _write_expected(tmp_path, **vals):
    p = tmp_path / "bench_expected.json"
    p.write_text(json.dumps(vals))
    return str(p)


class TestCheckRegressions:
    def test_clean_within_tolerance(self, tmp_path):
        p = _write_expected(tmp_path, fit_sec_per_image=1.10,
                            train_step_ms=525.0, value=9.1e6)
        out = {"fit_sec_per_image": 1.15, "train_step_ms": 500.0,
               "value": 9.0e6}
        assert bench.check_regressions(out, p) == []

    def test_lower_better_drift_flagged(self, tmp_path):
        p = _write_expected(tmp_path, fit_sec_per_image=1.10)
        out = {"fit_sec_per_image": 1.39}
        regs = bench.check_regressions(out, p)
        assert len(regs) == 1 and regs[0].startswith("fit_sec_per_image")

    def test_higher_better_drift_flagged(self, tmp_path):
        p = _write_expected(tmp_path, train_imgs_per_sec=30.4, value=9.1e6)
        out = {"train_imgs_per_sec": 20.0, "value": 9.2e6}
        regs = bench.check_regressions(out, p)
        assert len(regs) == 1 and regs[0].startswith("train_imgs_per_sec")

    def test_improvement_never_flagged(self, tmp_path):
        p = _write_expected(tmp_path, fit_sec_per_image=1.10,
                            train_imgs_per_sec=30.4)
        out = {"fit_sec_per_image": 0.5, "train_imgs_per_sec": 60.0}
        assert bench.check_regressions(out, p) == []

    def test_missing_metrics_skipped(self, tmp_path):
        p = _write_expected(tmp_path, fit_sec_per_image=1.10)
        assert bench.check_regressions({"fit_sec_per_image": None}, p) == []
        assert bench.check_regressions({}, p) == []

    def test_no_expected_file_is_clean(self, tmp_path):
        out = {"fit_sec_per_image": 99.0}
        assert bench.check_regressions(
            out, str(tmp_path / "nope.json")) == []

    def test_repo_expected_file_parses(self):
        # the checked-in blessed values must stay loadable and only carry
        # known metric names (plus the _comment key)
        regs = bench.check_regressions({})
        assert regs == []
        import os
        path = os.path.join(os.path.dirname(bench.__file__),
                            "bench_expected.json")
        with open(path) as f:
            vals = json.load(f)
        unknown = set(vals) - set(bench._DIRECTIONS) - {"_comment"}
        assert not unknown, unknown
