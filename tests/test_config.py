import json

import pytest

from gst_tacotron_tpu.config import (
    Config,
    PRESETS,
    apply_overrides,
    get_preset,
    load_config,
    parse_cli_overrides,
    save_config,
    to_dict,
)


def test_default_roundtrip(tmp_path):
    cfg = Config()
    path = tmp_path / "cfg.json"
    save_config(cfg, str(path))
    loaded = load_config(str(path))
    assert loaded == cfg


def test_overrides():
    cfg = Config()
    cfg2 = apply_overrides(cfg, {"model.decoder.reduction_factor": 1, "name": "x"})
    assert cfg2.model.decoder.reduction_factor == 1
    assert cfg2.name == "x"
    # original untouched (frozen dataclasses)
    assert cfg.model.decoder.reduction_factor == 2


def test_override_unknown_key_raises():
    with pytest.raises(KeyError):
        apply_overrides(Config(), {"model.decoder.nope": 1})


def test_cli_override_parsing():
    ov = parse_cli_overrides(["a.b=3", "c=true", "d=hello", "e=[1,2]"])
    assert ov == {"a.b": 3, "c": True, "d": "hello", "e": [1, 2]}


def test_presets_cover_driver_configs():
    names = set(PRESETS)
    assert names == {
        "taco1_lj",
        "gst_lj",
        "gst_r1_location",
        "gst_multispeaker",
        "gst_wavernn",
    }
    assert get_preset("taco1_lj").model.gst.enabled is False
    assert get_preset("gst_lj").model.gst.enabled is True
    c3 = get_preset("gst_r1_location")
    assert c3.model.decoder.reduction_factor == 1
    assert c3.model.attention.kind == "location_sensitive"
    assert get_preset("gst_multispeaker").model.num_speakers > 1
    assert get_preset("gst_wavernn").model.vocoder.kind == "wavernn"


def test_audio_derived():
    cfg = Config()
    assert cfg.audio.num_freq == cfg.audio.n_fft // 2 + 1


def test_json_serializable():
    json.dumps(to_dict(get_preset("gst_lj")))
