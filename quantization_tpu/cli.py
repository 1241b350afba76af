"""Command-line interface.

The reference has no CLI (SURVEY.md section 1: "no CLI, no config system");
its workflows are hand-run ``__main__`` scripts.  This module packages those
workflows:

    python -m quantization_tpu train  --data corpus/ --dim 512 --bytes-per-frame 8 \
        --out quantizer.npz [--iters 10000] [--batch 600] [--init multi_kmeans]
    python -m quantization_tpu encode --quantizer quantizer.npz --data corpus/ \
        --out codes.npy [--search cd2+seqbeam]
    python -m quantization_tpu decode --quantizer quantizer.npz --codes codes.npy \
        --out recon.npy
    python -m quantization_tpu convert --hdf5 training_data.hdf5 --out corpus/

``--data`` accepts a shard directory (see ``data/shards.py``) or a
reference-format ``.hdf5`` archive (`quantization/quantization.py:755-761`).
"""

from __future__ import annotations

import argparse
import logging
import os
import pathlib
import sys
import time

import numpy as np

logger = logging.getLogger("quantization_tpu.cli")


def _iter_batches(data: str, batch: int, seed: int = 0):
    """Batch iterator over a shard dir or .hdf5 archive."""
    p = pathlib.Path(data)
    if p.is_dir():
        from .data.shards import ShardStream

        return iter(ShardStream(p, batch_size=batch, seed=seed))
    from .data.hdf5 import read_hdf5_data, minibatch_iterator

    train, _ = read_hdf5_data(str(p), seed=seed)
    return minibatch_iterator(train, batch, seed=seed)


def _iter_sequential(data: str, batch: int, limit: int | None = None):
    """Order-preserving batch iterator (row k of the output corresponds to
    corpus frame k): shard files in manifest order or HDF5 datasets in key
    order, no shuffling, no duplication."""
    p = pathlib.Path(data)
    if p.is_dir():
        from .data.shards import iter_shards_sequential

        # raw-f16 batches, ZERO host-side conversion: the device upcast
        # fuses for free, while a host astype caps one core at ~125K
        # frames/s — far below the kernel encode rate
        it = iter_shards_sequential(p, batch_size=batch, dtype=np.float16)
    else:
        from .data.hdf5 import iter_hdf5_sequential

        it = iter_hdf5_sequential(str(p), batch)
    tot = 0
    for b in it:
        if limit is not None and tot + b.shape[0] > limit:
            b = b[: limit - tot]
        if b.shape[0]:
            tot += b.shape[0]
            yield b
        if limit is not None and tot >= limit:
            return


def cmd_train(args) -> None:
    import jax

    from .train.trainer import QuantizerTrainer
    from .utils.serialization import save_quantizer

    if str(args.out).endswith((".pt", ".pth")):
        # fail BEFORE training: the torch-format save would otherwise raise
        # only after the full schedule, discarding the trained parameters
        import importlib.util

        if importlib.util.find_spec("torch") is None:
            raise SystemExit(
                f"--out {args.out}: saving in the torch checkpoint format "
                "requires torch; install it or use a .npz output path"
            )

    it = _iter_batches(args.data, args.batch, args.seed)
    kw = {}
    if args.init == "multi_kmeans":
        kw = dict(init="multi_kmeans", init_data=next(it))
    trainer = QuantizerTrainer(
        dim=args.dim,
        bytes_per_frame=args.bytes_per_frame,
        phase_one_iters=args.iters,
        phase_two_iters=args.iters,
        lr=args.lr,
        seed=args.seed,
        diagnostics=not args.quiet,
        train_search=args.train_search,
        beam_finetune_iters=args.beam_finetune_iters,
        **kw,
    )
    t0 = time.time()
    total = 2 * args.iters + 1
    while not trainer.done():
        n = min(args.chunk, total - trainer.cur_iter)
        xs = np.stack([next(it) for _ in range(n)])
        trainer.step_many(xs)
        if not args.quiet:
            logger.info(
                "iter %d/%d (%.0fs)", trainer.cur_iter, total, time.time() - t0
            )
    q = trainer.get_quantizer()
    save_quantizer(args.out, q)
    logger.info("saved %s (id=%s) after %.0fs", args.out, q.get_id(), time.time() - t0)


def _prefetch(it, depth: int = 4):
    """Background-thread batch prefetch.

    The sequential readers spend their time in ``np.fromfile`` (which
    releases the GIL), so on a multi-core host a reader thread overlaps
    disk reads with device dispatch/fetch in the consume loop.  Exceptions
    propagate to the consumer.  (On a 1-core host this is neutral:
    measured in BASELINE.md's data-path section, where the e2e encode is
    core-count-bound.)"""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()
    err = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            err.append(e)
        finally:
            q.put(done)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            return
        yield item


def cmd_encode(args) -> None:
    from .utils.serialization import load_quantizer

    q = load_quantizer(args.quantizer)
    search_kwargs = {}
    if args.M is not None:
        search_kwargs["M"] = args.M
    if args.R is not None:
        search_kwargs["R"] = args.R
    if args.block_b is not None:
        search_kwargs["block_b"] = args.block_b
    if args.pool_mask is not None:
        search_kwargs["pool_mask"] = args.pool_mask
    if args.interleave is not None:
        search_kwargs["interleave"] = args.interleave

    # Streaming, order-preserving encode with dispatch/IO overlap: keep a
    # small queue of in-flight device computations so batch k+1's host read
    # and device upload happen while batch k computes.
    codes = []
    pending = []
    t0 = None  # first batch includes compilation; time from the second on
    done_after_first = 0
    for x in _prefetch(_iter_sequential(args.data, args.batch, args.limit)):
        pending.append(
            q.encode(
                x,
                refine_indexes_iters=args.refine_iters,
                search_method=args.search,
                **search_kwargs,
            )
        )
        if t0 is None:
            pending[0].block_until_ready()
            t0 = time.time()
        else:
            done_after_first += x.shape[0]
        if len(pending) > 3:
            codes.append(np.asarray(pending.pop(0)))
    codes.extend(np.asarray(c) for c in pending)
    out = np.concatenate(codes)
    np.save(args.out, out)
    if done_after_first:
        logger.info(
            "encoded %d frames -> %s (%.1fK vec/s steady-state)",
            out.shape[0], args.out, done_after_first / (time.time() - t0) / 1e3,
        )
    else:
        logger.info("encoded %d frames -> %s", out.shape[0], args.out)


def cmd_decode(args) -> None:
    from .utils.serialization import load_quantizer

    q = load_quantizer(args.quantizer)
    codes = np.load(args.codes)
    recon = []
    for start in range(0, codes.shape[0], args.batch):
        recon.append(np.asarray(q.decode(codes[start : start + args.batch])))
    out = np.concatenate(recon)
    np.save(args.out, out)
    logger.info("decoded %d frames -> %s", out.shape[0], args.out)


def cmd_convert(args) -> None:
    from .data.shards import convert_hdf5_to_shards

    manifest = convert_hdf5_to_shards(args.hdf5, args.out, args.frames_per_shard)
    logger.info(
        "wrote %d shards, %d frames, dim=%d -> %s",
        len(manifest["shards"]),
        sum(s["frames"] for s in manifest["shards"]),
        manifest["dim"],
        args.out,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="quantization_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="two-phase quantizer training")
    p.add_argument("--data", required=True, help="shard dir or .hdf5 archive")
    p.add_argument("--dim", type=int, required=True)
    p.add_argument("--bytes-per-frame", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--iters", type=int, default=10000, help="per phase")
    p.add_argument("--batch", type=int, default=600)
    p.add_argument("--lr", type=float, default=0.005)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk", type=int, default=100, help="steps per dispatch")
    p.add_argument("--init", choices=["default", "multi_kmeans"], default="default")
    p.add_argument("--train-search", default="auto",
                   help="auto (exact beam — full-schedule quality parity; "
                        "default) | beam | seqbeam (fused kernel phase-2 "
                        "search: +22%% steps/s; defaults to an exact-beam "
                        "finetune tail, see --beam-finetune-iters — "
                        "kernel+ft1000 measured ratio 1.0057 vs the torch "
                        "reference at the full d512 schedule, in the 1%% "
                        "bar; pure kernel without the tail measured 1.0167)")
    p.add_argument("--beam-finetune-iters", type=int, default=None,
                   help="run the FINAL N steps with the exact beam search "
                        "regardless of --train-search (default: 1000 when "
                        "--train-search is a kernel, 0 otherwise)")
    p.add_argument("--quiet", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("encode", help="bulk encode a corpus to byte codes")
    p.add_argument("--quantizer", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--refine-iters", type=int, default=5)
    p.add_argument("--search", default="auto",
                   help="auto (fastest within 1%% of beam-5; default) | "
                        "beam | seqbeam | cdN+seqbeam | cd")
    p.add_argument("--M", type=int, default=None,
                   help="beam width for seqbeam kernel (e.g. 32)")
    p.add_argument("--R", type=int, default=None,
                   help="per-beam-entry expansion for seqbeam kernel")
    p.add_argument("--block-b", type=int, default=None,
                   help="kernel batch tile size")
    p.add_argument("--pool-mask", default=None,
                   help="seqbeam step schedule, e.g. 'altparity' (pool "
                        "selection on half the codebook steps; ~10%% faster "
                        "within the 1%% quality bar)")
    p.add_argument("--interleave", type=int, default=None,
                   help="seqbeam sub-tile interleave (2 overlaps one "
                        "sub-tile's MXU with the other's VPU)")
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("decode", help="reconstruct frames from byte codes")
    p.add_argument("--quantizer", required=True)
    p.add_argument("--codes", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=65536)
    p.set_defaults(fn=cmd_decode)

    p = sub.add_parser("convert", help="HDF5 archive -> raw-f16 shards")
    p.add_argument("--hdf5", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frames-per-shard", type=int, default=1 << 20)
    p.set_defaults(fn=cmd_convert)

    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s: %(message)s"
    )
    # Persistent compilation cache: the fused kernels take ~1 min to compile
    # cold; cache them across CLI invocations (opt out via
    # QUANTIZATION_TPU_NO_CACHE=1).
    if not os.environ.get("QUANTIZATION_TPU_NO_CACHE"):
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "QUANTIZATION_TPU_CACHE_DIR",
                os.path.expanduser("~/.cache/quantization_tpu_jax"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
