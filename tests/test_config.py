"""Config system + shipped YAML configs: interpolation, CLI merge, sanity."""
import pytest

from synchformer_tpu.config import Config, load_config, merge_cli_overrides
from synchformer_tpu.config.sanity import cfg_sanity_check_and_patch
from synchformer_tpu.registry import instantiate_from_config

CONFIG_DIR = "synchformer_tpu/config/configs"


def test_interpolation_and_add_resolver():
    cfg = Config({
        "a": {"b": 768},
        "c": "${a.b}",
        "d": "${add: 2, 3}",
        "e": "${add: 1, a.b}",
        "s": "dim=${a.b}",
    })
    assert cfg.c == 768
    assert cfg.d == 5
    assert cfg.e == 769
    assert cfg.s == "dim=768"


def test_cli_override_wins():
    cfg = Config({"training": {"seed": 1337, "lr": 1e-4}})
    merge_cli_overrides(cfg, ["training.seed=7", "training.new_key=hello",
                              "fresh.nested.flag=true"])
    assert cfg.training.seed == 7
    assert cfg.training.new_key == "hello"
    assert cfg.fresh.nested.flag is True
    assert cfg.training.lr == 1e-4


@pytest.mark.parametrize("name", ["sync.yaml", "ft_synchability.yaml",
                                  "segment_avclip.yaml"])
def test_shipped_configs_load_and_pass_sanity(name):
    cfg = load_config(f"{CONFIG_DIR}/{name}")
    cfg_sanity_check_and_patch(cfg)
    # interpolations resolve
    assert cfg.model.target.startswith("synchformer_tpu.models")


def test_sync_config_model_instantiates():
    cfg = load_config(f"{CONFIG_DIR}/sync.yaml")
    model = instantiate_from_config(cfg.model.to_dict())
    # flax modules are dataclasses; construction validates field names
    assert model.transformer["params"]["n_embd"] == 768
    assert model.transformer["params"]["off_head_cfg"]["params"]["out_features"] == 21


def test_sanity_rejects_bad_combos():
    cfg = load_config(f"{CONFIG_DIR}/sync.yaml")
    cfg.data.n_segments = 30  # cannot fit 30 half-overlapping segments in 5 s
    with pytest.raises(AssertionError):
        cfg_sanity_check_and_patch(cfg)

    cfg2 = load_config(f"{CONFIG_DIR}/sync.yaml")
    cfg2.data.offset_type = "uniform_binary"  # needs prob_oos
    with pytest.raises(AssertionError):
        cfg_sanity_check_and_patch(cfg2)

    cfg3 = Config({"action": "bogus"})
    with pytest.raises(AssertionError):
        cfg_sanity_check_and_patch(cfg3)


def test_sanity_reference_patches_and_exclusions():
    """The reference's patch/assert set (ref: utils/utils.py:95-148):
    legacy fixed-offsets flag spelling, pairwise-exclusive training modes,
    loss/offset family match, tower-ckpt nulling on resume, and the
    train_avclip tower agreement checks."""
    # legacy load_fixed_offsets_on_test is rewritten then removed
    cfg = load_config(f"{CONFIG_DIR}/sync.yaml")
    cfg.data.dataset.params["load_fixed_offsets_on_test"] = True
    cfg.data.dataset.params.pop("load_fixed_offsets_on", None)
    cfg_sanity_check_and_patch(cfg)
    assert "load_fixed_offsets_on_test" not in cfg.data.dataset.params
    assert list(cfg.data.dataset.params["load_fixed_offsets_on"]) == \
        ["val", "valid", "test"]

    # resume + finetune is invalid
    cfg = load_config(f"{CONFIG_DIR}/sync.yaml")
    cfg.training.resume = True
    cfg.training.finetune = True
    with pytest.raises(AssertionError):
        cfg_sanity_check_and_patch(cfg)

    # grid offsets with an mse loss is invalid
    cfg = load_config(f"{CONFIG_DIR}/sync.yaml")
    cfg.data.offset_type = "grid"
    cfg.training.loss_fn = ["torch.nn.functional", "mse_loss"]
    with pytest.raises(AssertionError):
        cfg_sanity_check_and_patch(cfg)

    # resuming drops standalone tower ckpt paths (the model ckpt has them)
    cfg = load_config(f"{CONFIG_DIR}/sync.yaml")
    cfg.training.run_test_only = True
    cfg.model.params.afeat_extractor.params["ckpt_path"] = "/tmp/a.pt"
    cfg_sanity_check_and_patch(cfg)
    assert cfg.model.params.afeat_extractor.params["ckpt_path"] is None

    # train_avclip towers must agree on multi-level settings
    cfg = load_config(f"{CONFIG_DIR}/segment_avclip.yaml")
    cfg.model.params.afeat_extractor.params["add_global_repr"] = True
    cfg.model.params.vfeat_extractor.params["add_global_repr"] = False
    with pytest.raises(AssertionError):
        cfg_sanity_check_and_patch(cfg)


def test_show_cfg_diffs_writes_unified_diff(tmp_path):
    """ref: utils/utils.py:193-204 — YAML-rendered unified diff, written to a
    file when a path is given."""
    from synchformer_tpu.utils.logger import show_cfg_diffs

    old = {"training": {"lr": 1e-4, "resume": False}, "action": "train_avsync_model"}
    new = {"training": {"lr": 5e-5, "resume": False}, "action": "train_avsync_model"}
    out = tmp_path / "cfg_diffs.diff"
    lines = show_cfg_diffs(old, new, str(out))
    text = out.read_text()
    assert "-" in text and "+" in text
    assert any("lr" in l for l in lines if l.startswith("-")), lines
    assert any("lr" in l for l in lines if l.startswith("+")), lines
    # identical configs -> empty diff
    assert show_cfg_diffs(new, new, str(out)) == []
