"""Lossless config round-trip: every key of the reference experiment json
and of the full reference flag schema (model/options.py:9-202) is
accounted for — loaded, aliased, or pinned intentionally-inert — and
anything else warns (VERDICT r2 item 7)."""
import dataclasses
import json
import os
import re
import warnings

import pytest

from chore_tpu.config import (
    CONFIG_ALIASES,
    REFERENCE_INERT_KEYS,
    ChoreConfig,
    config_from_dict,
    load_config,
    save_config,
)

REF = "/root/reference"
RELEASE_JSON = os.path.join(REF, "config", "chore-release.json")
OPTIONS_PY = os.path.join(REF, "model", "options.py")

FIELDS = {f.name for f in dataclasses.fields(ChoreConfig)}


@pytest.mark.skipif(not os.path.isfile(RELEASE_JSON),
                    reason="reference config not available")
class TestReleaseJson:
    def test_loads_without_warnings(self):
        with open(RELEASE_JSON) as f:
            data = json.load(f)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            cfg = config_from_dict(data)
        # behavior-driving release values land
        assert cfg.num_stack == 5
        assert cfg.num_hourglass == 2
        assert cfg.hourglass_dim == 256
        assert cfg.loadSize == 1200
        assert cfg.z_0 == 2.2
        assert tuple(cfg.milestones) == (15, 25)
        assert cfg.clamp_thres == 0.1
        assert cfg.input_type == "RGBM3"

    def test_every_key_accounted(self):
        with open(RELEASE_JSON) as f:
            data = json.load(f)
        unaccounted = [
            k for k in data
            if k not in FIELDS and k not in CONFIG_ALIASES
            and k not in REFERENCE_INERT_KEYS
        ]
        assert unaccounted == [], unaccounted

    def test_load_config_by_exp_name(self):
        cfg = load_config("chore-release",
                          config_dir=os.path.join(REF, "config"))
        assert cfg.exp_name == "chore-release"
        assert cfg.num_stack == 5


@pytest.mark.skipif(not os.path.isfile(OPTIONS_PY),
                    reason="reference options not available")
class TestFullFlagSchema:
    def test_all_112_flags_accounted(self):
        """Pins the inert list against the FULL reference argparse schema:
        a reference flag that is neither a field, an alias, nor pinned
        inert would be silently droppable — that set must stay empty."""
        with open(OPTIONS_PY) as f:
            flags = set(re.findall(r"add_argument\(\s*[\"']--([A-Za-z0-9_]+)",
                                   f.read()))
        assert len(flags) > 100  # schema didn't shrink under us
        unaccounted = sorted(
            k for k in flags
            if k not in FIELDS and k not in CONFIG_ALIASES
            and k not in REFERENCE_INERT_KEYS
        )
        assert unaccounted == [], unaccounted

    def test_inert_list_has_no_supported_keys(self):
        """A key can't be both supported and inert."""
        assert not (REFERENCE_INERT_KEYS & FIELDS)
        assert not (REFERENCE_INERT_KEYS & set(CONFIG_ALIASES))


class TestAccounting:
    def test_unknown_key_warns(self):
        with pytest.warns(UserWarning, match="totally_new_flag"):
            cfg = config_from_dict({"num_stack": 2,
                                    "totally_new_flag": 7})
        assert cfg.num_stack == 2

    def test_inert_key_silent(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            config_from_dict({"gpu_ids": "0,1", "model_type": "comb"})

    def test_alias_fallback_only(self):
        assert config_from_dict({"name": "legacy"}).exp_name == "legacy"
        cfg = config_from_dict({"name": "legacy", "exp_name": "primary"})
        assert cfg.exp_name == "primary"
        assert config_from_dict(
            {"schedule": [10, 20]}).milestones == [10, 20]

    def test_round_trip(self, tmp_path):
        cfg = ChoreConfig(exp_name="rt", num_stack=3, sigmas=[0.1, 0.2])
        save_config(cfg, config_dir=str(tmp_path))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            back = load_config("rt", config_dir=str(tmp_path))
        assert back.num_stack == 3
        assert list(back.sigmas) == [0.1, 0.2]
