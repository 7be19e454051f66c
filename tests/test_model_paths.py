"""extra_model_paths.yaml config (reference comfyUI/main.py:202-236
load_extra_path_config / utils/extra_config.py)."""

from pathlib import Path

from stable_renderer_tpu.utils.model_paths import (
    auto_extra_model_paths,
    load_extra_model_paths,
)


def test_load_extra_model_paths(tmp_path):
    (tmp_path / "sd" / "models" / "Stable-diffusion").mkdir(parents=True)
    (tmp_path / "sd" / "models" / "Lora").mkdir(parents=True)
    (tmp_path / "sd" / "models" / "LyCORIS").mkdir(parents=True)
    yml = tmp_path / "extra_model_paths.yaml"
    yml.write_text(f"""
a111:
  base_path: {tmp_path}/sd/
  checkpoints: models/Stable-diffusion
  vae: models/VAE
  loras: |
    models/Lora
    models/LyCORIS
""")
    dirs = load_extra_model_paths(str(yml))
    names = [Path(d).name for d in dirs]
    assert "Stable-diffusion" in names            # existing dir registered
    assert "Lora" in names and "LyCORIS" in names  # multi-line subpaths
    assert "VAE" not in names                      # missing dir skipped


def test_auto_extra_model_paths(tmp_path):
    assert auto_extra_model_paths(str(tmp_path)) == ()
    (tmp_path / "ckpt").mkdir()
    (tmp_path / "extra_model_paths.yaml").write_text(
        f"mine:\n  checkpoints: {tmp_path}/ckpt\n")
    dirs = auto_extra_model_paths(str(tmp_path))
    assert dirs and dirs[0].endswith("ckpt")
    # malformed yaml: warn-and-continue, no crash
    (tmp_path / "extra_model_paths.yaml").write_text(":\n  - [")
    assert auto_extra_model_paths(str(tmp_path)) == ()


def test_model_file_resolution_through_executor(tmp_path):
    from stable_renderer_tpu.workflow.executor import (
        InferenceContext, _find_model_file,
    )

    d = tmp_path / "checkpoints"
    d.mkdir()
    (d / "model.safetensors").write_bytes(b"x")
    ctx = InferenceContext(model_dirs=(str(d),))
    assert _find_model_file(ctx, "model.safetensors").endswith("model.safetensors")
    assert _find_model_file(ctx, "sub/model.safetensors") is not None  # basename fallback
    assert _find_model_file(ctx, "missing.safetensors") is None
