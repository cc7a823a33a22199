"""User-study stimulus generator (odd-one-out counterfactual GIFs).

The reference ships the *artifacts* of its perceptual user studies —
two-frame GIF stimuli plus an answer key
(`/root/reference/all_user_studies/user_study_images_old_plant/study_1/
class_study_0.gif`, `info_of_images.txt`) — but not the code that made
them. This module regenerates that artifact family from a trained model
and precomputed AttFind records:

* Each stimulus is a square two-frame GIF (reference: 1030x1030 at
  750 ms/frame = a 2x2 grid of 512px panels with 2px gutters). Frame 0
  shows four base reconstructions; frame 1 shows their counterfactuals.
* Three quadrants apply the SAME ranked (direction, sindex) StyleSpace
  shift to three different images; the fourth (the odd one out) applies a
  different ranked style. The participant's task is to spot it.
* ``info_of_images.txt`` is the answer key, in the reference's exact
  textual schema: a position label line, a ``(question, gif)`` index pair
  (GIF filenames are shuffled so the name never leaks the question
  order), and the 4x2 ``[direction, sindex]`` matrix. The reference's
  generator is absent so its quadrant ordering is unrecoverable; ours is
  documented: row-major ``[top-left, top-right, bottom-left,
  bottom-right]``.

All rendering goes through the explicit ``style_delta`` generator input —
one batched forward per frame (4 panels at once), never the reference's
in-place bias mutation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from stylex_tpu.attfind.extraction import AttFindRecords
from stylex_tpu.attfind.visualize import _gen

__all__ = ["render_study_frames", "generate_user_study", "QUADRANT_NAMES"]

QUADRANT_NAMES = ("top-left", "top-right", "bottom-left", "bottom-right")


def _compose_grid(panels: Sequence[np.ndarray], panel_px: int, gutter: int) -> np.ndarray:
    """Compose four HxWx3 uint8 panels into one 2x2 grid frame with black
    gutters (reference geometry: 2*panel + 3*gutter per side)."""
    from PIL import Image

    side = 2 * panel_px + 3 * gutter
    canvas = Image.new("RGB", (side, side), (0, 0, 0))
    for q, panel in enumerate(panels):
        im = Image.fromarray(panel).resize((panel_px, panel_px), Image.BILINEAR)
        x = gutter + (q % 2) * (panel_px + gutter)
        y = gutter + (q // 2) * (panel_px + gutter)
        canvas.paste(im, (x, y))
    return np.asarray(canvas)


def render_study_frames(
    modules,
    params,
    classifier_fn,
    records: AttFindRecords,
    image_ids: Sequence[int],
    styles: Sequence[tuple[int, int]],
    shift_size: float = 1.0,
    panel_px: int = 512,
    gutter: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Render one stimulus: (base_frame, counterfactual_frame) uint8 grids.

    ``image_ids[q]`` and ``styles[q] = (direction, sindex)`` give quadrant
    q's record row and StyleSpace shift. Each frame is a single batched
    generator+classifier forward over the four quadrants (shared noise
    broadcasts at batch 1, as everywhere else in the sweep)."""
    from stylex_tpu.utils.image import to_uint8

    C = records.style_change.shape[2]
    w = jnp.asarray(records.latents[np.asarray(image_ids)])
    delta = np.zeros((len(image_ids), C), dtype=np.float32)
    for q, (i, (direction, sindex)) in enumerate(zip(image_ids, styles)):
        coord = records.style_coordinates[i, sindex]
        extreme = (
            records.minima[sindex] if direction == 0 else records.maxima[sindex]
        )
        delta[q, sindex] = (extreme - coord) * shift_size
    base, _ = _gen(modules, params, classifier_fn, w, records.noise)
    pert, _ = _gen(modules, params, classifier_fn, w, records.noise, jnp.asarray(delta))
    base_panels = to_uint8(np.asarray(base))
    pert_panels = to_uint8(np.asarray(pert))
    return (
        _compose_grid(list(base_panels), panel_px, gutter),
        _compose_grid(list(pert_panels), panel_px, gutter),
    )


def _pick_images(rng, candidates: np.ndarray, k: int, exclude: set[int]) -> list[int]:
    pool = [int(i) for i in candidates if int(i) not in exclude]
    if len(pool) >= k:
        return [int(i) for i in rng.choice(np.asarray(pool), size=k, replace=False)]
    # scarce records: fall back to reuse across quadrants rather than fail
    extra = [int(i) for i in candidates]
    picks = pool[:]
    while len(picks) < k and extra:
        picks.append(extra[len(picks) % len(extra)])
    return picks[:k]


def generate_user_study(
    modules,
    params,
    classifier_fn,
    records: AttFindRecords,
    out_dir,
    num_studies: int = 6,
    ranked: Optional[Sequence[tuple[int, int]]] = None,
    num_indices: int = 6,
    num_classes: int = 2,
    effect_threshold: float = 0.1,
    shift_size: float = 1.0,
    panel_px: int = 512,
    gutter: int = 2,
    frame_ms: int = 750,
    seed: int = 0,
) -> list[dict]:
    """Write ``class_study_<gif>.gif`` stimuli + ``info_of_images.txt``.

    Study k's majority style is ``ranked[k % len(ranked)]`` and the odd
    quadrant uses the next distinct ranked style; quadrant images are
    drawn (seeded) from records whose recorded class-0 effect for that
    style exceeds ``effect_threshold`` (falling back to the largest-effect
    images when fewer qualify). Returns the per-study metadata that the
    answer key serializes."""
    from PIL import Image

    from stylex_tpu.attfind.analysis import rank_styles

    if ranked is None:
        ranked, _ = rank_styles(
            records,
            num_classes=num_classes,
            num_indices=num_indices,
            effect_threshold=effect_threshold,
        )
    ranked = [(int(d), int(s)) for d, s in ranked]
    if len(ranked) < 2:
        raise ValueError(
            f"user study needs >=2 ranked styles to build an odd-one-out, got {ranked}"
        )

    rng = np.random.RandomState(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    gif_order = rng.permutation(num_studies)

    def candidates(direction: int, sindex: int) -> np.ndarray:
        effects = records.style_change[:, direction, sindex, 0]
        above = np.flatnonzero(effects > effect_threshold)
        # scarce fallback: the strongest-effect images, in effect order
        return above if above.size >= 1 else np.argsort(effects)[::-1][:4]

    studies = []
    for k in range(num_studies):
        main = ranked[k % len(ranked)]
        odd = ranked[(k + 1) % len(ranked)]
        if odd == main:  # single repeated style in `ranked`
            odd = next(st for st in ranked if st != main)
        odd_pos = int(rng.randint(4))

        main_ids = _pick_images(rng, candidates(*main), 3, exclude=set())
        odd_ids = _pick_images(rng, candidates(*odd), 1, exclude=set(main_ids))
        image_ids, styles = [], []
        main_iter = iter(main_ids)
        for q in range(4):
            if q == odd_pos:
                image_ids.append(odd_ids[0])
                styles.append(odd)
            else:
                image_ids.append(next(main_iter))
                styles.append(main)

        base, pert = render_study_frames(
            modules, params, classifier_fn, records, image_ids, styles,
            shift_size=shift_size, panel_px=panel_px, gutter=gutter,
        )
        gif_idx = int(gif_order[k])
        frames = [Image.fromarray(base), Image.fromarray(pert)]
        frames[0].save(
            out / f"class_study_{gif_idx}.gif",
            save_all=True,
            append_images=frames[1:],
            duration=frame_ms,
            loop=0,
        )
        studies.append(
            {
                "question": k,
                "gif": gif_idx,
                "odd_position": odd_pos,
                "image_ids": image_ids,
                "styles": styles,
            }
        )

    # answer key, in the reference's textual schema
    # (`all_user_studies/user_study_images_old_plant/study_1/info_of_images.txt`)
    lines = []
    for st in studies:
        mat = np.asarray([[d, s] for d, s in st["styles"]], dtype=np.int64)
        lines.append(
            f"Odd transformation in {QUADRANT_NAMES[st['odd_position']]} \n"
            f" ({st['question']}, {st['gif']}) \n {mat} \n"
        )
    (out / "info_of_images.txt").write_text("\n".join(lines))
    return studies


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Generate odd-one-out counterfactual user-study stimuli"
    )
    p.add_argument("--records", required=True,
                   help="path to style_change_records.hdf5")
    p.add_argument("--out", default="./user_study")
    p.add_argument("--num-studies", type=int, default=6)
    p.add_argument("--num-indices", type=int, default=6)
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--effect-threshold", type=float, default=0.1)
    p.add_argument("--shift-size", type=float, default=1.0)
    p.add_argument("--panel-px", type=int, default=512)
    p.add_argument("--frame-ms", type=int, default=750)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--name", required=True,
                   help="model name under --models-dir")
    p.add_argument("--base-dir", default="./")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--load-from", type=int, default=-1)
    p.add_argument("--classifier-name", default="resnet")
    p.add_argument("--classifier-path", default=None)
    args = p.parse_args(argv)

    from stylex_tpu.attfind import load_records_hdf5
    from stylex_tpu.train.trainer import Trainer

    records = load_records_hdf5(args.records)
    trainer = Trainer(
        name=args.name,
        base_dir=args.base_dir,
        models_dir=args.models_dir,
        classifier_name=args.classifier_name,
        classifier_path=args.classifier_path,
    )
    trainer.load(args.load_from, inference=True)
    studies = generate_user_study(
        trainer.modules,
        trainer.full_params,
        trainer.classifier.classify_images,
        records,
        args.out,
        num_studies=args.num_studies,
        num_indices=args.num_indices,
        num_classes=args.num_classes,
        effect_threshold=args.effect_threshold,
        shift_size=args.shift_size,
        panel_px=args.panel_px,
        frame_ms=args.frame_ms,
        seed=args.seed,
    )
    print(f"wrote {len(studies)} stimuli + info_of_images.txt under {args.out}")


if __name__ == "__main__":
    main()
