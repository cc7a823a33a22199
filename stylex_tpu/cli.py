"""CLI — the ``train_from_folder`` surface.

Flag-compatible with the reference's python-fire CLI
(`/root/reference/stylex/cli.py:84-254`): same kwarg names and defaults, so
reference invocations like

    python -m stylex_tpu.cli --data ./data/plant_village --image-size 64 \\
        --batch-size 4 --gradient-accumulate-every 8 --classifier-name resnet

work unchanged. ``fire`` isn't in this image, so a small built-in parser
handles ``--key value`` / ``--key=value`` (kebab or snake case, python
literals for lists/bools). Also exposes the eval-only ``generate`` /
``generate-interpolation`` modes and an ``attfind`` entry point.

Multi-process GPU spawning (`cli.py:241-250`) has no equivalent: JAX is
single-controller; ``num_devices`` picks the mesh size.
"""

from __future__ import annotations

import ast
import random as pyrandom
import sys
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from stylex_tpu.config import Arch, ModelConfig, TrainConfig

__all__ = ["train_from_folder", "main"]


def set_seed(seed: int) -> None:
    """Seed host RNGs (`set_seed`, `cli.py:35-40`); device RNG is keyed
    explicitly everywhere."""
    np.random.seed(seed)
    pyrandom.seed(seed)


def cast_list(el) -> List:
    return el if isinstance(el, (list, tuple)) else [el]


def train_from_folder(
    data: str = "./data",
    results_dir: str = "./results",
    models_dir: str = "./models",
    name: str = "default",
    new: bool = False,
    load_from: int = -1,
    image_size: int = 64,
    network_capacity: int = 16,
    fmap_max: int = 512,
    transparent: bool = False,
    batch_size: int = 4,
    gradient_accumulate_every: int = 8,
    num_train_steps: int = 150000,
    learning_rate: float = 2e-4,
    lr_mlp: float = 0.1,
    ttur_mult: float = 1.5,
    rel_disc_loss: bool = False,
    num_workers: Optional[int] = None,
    save_every: int = 500,
    evaluate_every: int = 50,
    generate: bool = False,
    num_generate: int = 1,
    generate_interpolation: bool = False,
    interpolation_num_steps: int = 100,
    save_frames: bool = False,
    num_image_tiles: int = 8,
    trunc_psi: float = 0.75,
    mixed_prob: float = 0.9,
    fp16: bool = False,
    no_pl_reg: bool = False,
    cl_reg: bool = False,
    fq_layers: Sequence[int] = (),
    fq_dict_size: int = 256,
    attn_layers: Sequence[int] = (),
    no_const: bool = False,
    aug_prob: Optional[float] = None,
    aug_types: Sequence[str] = ("translation", "cutout"),
    top_k_training: bool = False,
    generator_top_k_gamma: float = 0.99,
    generator_top_k_frac: float = 0.5,
    dual_contrast_loss: bool = False,
    dataset_aug_prob: float = 0.0,
    multi_gpus: bool = False,
    calculate_fid_every: Optional[int] = None,
    calculate_fid_num_images: int = 12800,
    clear_fid_cache: bool = False,
    seed: int = 42,
    log: bool = False,
    kl_scaling: float = 1.0,
    rec_scaling: float = 1.0,
    classifier_path: Optional[str] = None,
    lpips_path: Optional[str] = None,
    num_classes: int = 2,
    encoder_class: Optional[str] = None,
    sample_from_encoder: bool = True,
    alternating_training: bool = True,
    kl_rec_during_disc: bool = False,
    dataset_name: Optional[str] = None,
    tensorboard_dir: Optional[str] = "tb_logs_stylex",
    classifier_name: str = "resnet",
    use_old_architecture: bool = True,
    num_devices: Optional[int] = None,
    bf16: bool = False,
    remat: bool = False,
    steps_per_dispatch: int = 1,
    async_save: bool = True,
    fused_microbatches: bool = True,
) -> None:
    """Train (or run eval-only modes for) a StylEx model from an image folder."""
    from stylex_tpu.train.trainer import NanException, Trainer

    set_seed(seed)
    if multi_gpus:
        print(
            "--multi-gpus is a no-op here: JAX is single-controller; "
            "use --num-devices to size the data-parallel mesh."
        )

    model_cfg = ModelConfig(
        image_size=image_size,
        network_capacity=network_capacity,
        fmap_max=fmap_max,
        latent_dim=512 + num_classes,
        lr_mlp=lr_mlp,
        transparent=transparent,
        attn_layers=tuple(cast_list(attn_layers)),
        no_const=no_const,
        num_classes=num_classes,
        arch=Arch.OLD if use_old_architecture else Arch.NEW,
        encoder_class=encoder_class,
        fq_layers=tuple(cast_list(fq_layers)),
        fq_dict_size=fq_dict_size,
        # rematerialise generator blocks in the backward pass — the
        # standard high-resolution (256px+) memory/FLOP trade
        remat=remat,
    )
    train_cfg = TrainConfig(
        batch_size=batch_size,
        gradient_accumulate_every=gradient_accumulate_every,
        num_train_steps=num_train_steps,
        lr=learning_rate,
        ttur_mult=ttur_mult,
        mixed_prob=mixed_prob,
        kl_scaling=kl_scaling,
        rec_scaling=rec_scaling,
        alternating_training=alternating_training,
        kl_rec_during_disc=kl_rec_during_disc,
        sample_from_encoder=sample_from_encoder,
        dual_contrast_loss=dual_contrast_loss,
        rel_disc_loss=rel_disc_loss,
        cl_reg=cl_reg,
        top_k_training=top_k_training,
        generator_top_k_gamma=generator_top_k_gamma,
        generator_top_k_frac=generator_top_k_frac,
        aug_prob=aug_prob,
        num_workers=num_workers,
        aug_types=tuple(cast_list(aug_types)),
        dataset_aug_prob=dataset_aug_prob,
        no_pl_reg=no_pl_reg,
        save_every=save_every,
        evaluate_every=evaluate_every,
        calculate_fid_every=calculate_fid_every,
        calculate_fid_num_images=calculate_fid_num_images,
        trunc_psi=trunc_psi,
        num_image_tiles=num_image_tiles,
        seed=seed,
        compute_dtype="bfloat16" if (bf16 or fp16) else "float32",
        num_devices=num_devices,
        steps_per_dispatch=steps_per_dispatch,
        fused_microbatches=fused_microbatches,
        async_save=async_save,
    )

    trainer = Trainer(
        name=name,
        results_dir=results_dir,
        models_dir=models_dir,
        model_cfg=model_cfg,
        train_cfg=train_cfg,
        classifier_name=classifier_name,
        classifier_path=classifier_path,
        lpips_path=lpips_path,
        tensorboard_dir=tensorboard_dir,
        seed=seed,
        clear_fid_cache=clear_fid_cache,
    )
    if log:
        # reference `log=True` enables the aim sink (`stylex_train.py:1151`);
        # its role here is filled by the always-on metrics CSV
        print(
            "[stylex_tpu] --log: the aim sink is replaced by the metrics CSV "
            f"(results/{name}/metrics.csv), which is always on"
        )

    if generate:
        trainer.load(load_from)
        for i in range(num_generate):
            trainer.evaluate(num=i)
        print(f"sample images generated under {trainer.results_dir / name}")
        return

    if generate_interpolation:
        trainer.load(load_from)
        out = trainer.generate_interpolation(
            num=0, num_steps=interpolation_num_steps, save_frames=save_frames
        )
        print(f"interpolation generated at {out}")
        return

    if new:
        trainer.clear()
    else:
        trainer.load(load_from)

    trainer.set_data_src(data, dataset_name)

    try:
        import tqdm

        bar = tqdm.tqdm(
            initial=trainer.steps, total=num_train_steps, mininterval=10.0, desc=f"{name}"
        )
    except Exception:
        bar = None

    while trainer.steps < num_train_steps:
        prev_steps = trainer.steps
        # NaN -> checkpoint reload, retried 3x (`retry_call`, `cli.py:71-76`)
        retries = 3
        while True:
            try:
                metrics = trainer.train()
                break
            except NanException:
                retries -= 1
                if retries <= 0:
                    raise
        if bar is not None:
            bar.update(trainer.steps - prev_steps)
        # a >1-step dispatch may jump across a print cadence point
        if trainer.steps // 50 != prev_steps // 50:
            trainer.logger.print_line(trainer.steps, metrics)

    trainer.save(trainer.checkpoint_num)
    trainer.flush()  # the final save may be an in-flight background write


# ---------------------------------------------------------------------------
# minimal fire-compatible argv parsing
# ---------------------------------------------------------------------------


def _parse_value(v: str) -> Any:
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        low = v.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("none", "null"):
            return None
        return v


def parse_argv(argv: Sequence[str]) -> Dict[str, Any]:
    kwargs: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected positional argument: {arg}")
        key = arg[2:]
        if "=" in key:
            key, val = key.split("=", 1)
        elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
            i += 1
            val = argv[i]
        else:
            val = "True"  # bare flag
        if key.startswith("no") and "-" not in key and "_" not in key and val == "True":
            pass  # e.g. --new stays as-is; fire-style negation not used by reference
        kwargs[key.replace("-", "_")] = _parse_value(val)
        i += 1
    return kwargs


def main(argv: Optional[Sequence[str]] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("-h", "--help"):
        import inspect

        sig = inspect.signature(train_from_folder)
        print("usage: python -m stylex_tpu.cli [--flag value ...]\n\nflags:")
        for p in sig.parameters.values():
            print(f"  --{p.name.replace('_', '-')} (default: {p.default!r})")
        return
    train_from_folder(**parse_argv(argv))


if __name__ == "__main__":
    main()
