"""Evaluation/inference driver (the reference's `test.py:109-306` equivalent).

Supports both checkpoint formats: this framework's orbax directories and the
reference's ``.pth.tar`` files (via ``compat`` — enabling bit-parity eval
runs against PyTorch-trained weights).

Decode methods: on-device greedy (production path) or context beam search
with an optional LM (KenLM n-gram or the first-party JAX char LM).
"""

from __future__ import annotations

import os
import time
from typing import List, Tuple

import numpy as np


def load_recognizer_variables(model_file: str, state_template=None):
    """Checkpoint file/dir -> flax variables {params, batch_stats}."""
    from ..utils.ckpt_io import normalize_serving_dtype
    if model_file.endswith((".pth.tar", ".pth", ".pt")):
        from ..compat.torch_convert import convert_checkpoint
        return normalize_serving_dtype(convert_checkpoint(model_file))
    # Host-array restore: a checkpoint saved under a different topology
    # (CPU-trained vs TPU-eval, or a training mesh) restores fine and the
    # eval jits are free to place the arrays (``torch.load(map_location=
    # 'cpu')`` semantics, `test.py:152`).
    from ..utils.ckpt_io import restore_pytree_host
    payload = restore_pytree_host(os.path.abspath(model_file))
    if "params" in payload:
        # Dtype contract (utils.ckpt_io.normalize_serving_dtype): artifacts
        # may store bf16 for transport, but serving always loads f32 —
        # bf16-stored leaves compile a ~7.7x slower forward (VERDICT r4 #1).
        return normalize_serving_dtype(
            {"params": payload["params"],
             "batch_stats": payload.get("batch_stats", {})})
    raise ValueError(f"unrecognized checkpoint layout at {model_file}")


def build_beam_decoder(codec, args):
    """Wire up beam search from CLI flags (mirrors
    ``codec.set_beam_search``, `ctc_codec.py:101-122`)."""
    from ..decode.beam_host import BeamSearchConfig, BeamSearchDecoder
    from ..decode.lm_interface import NullLM, build_lm_backend

    lm = build_lm_backend(
        tfm_path=args.tfm_path, kenlm_path=args.kenlm_path,
        use_tfm=args.use_tfm_pred or args.use_tfm_score)
    import math
    cfg = BeamSearchConfig(
        beam_size=args.beam_size, search_depth=args.search_depth,
        lm_panelty=args.lm_panelty, len_bonus=args.len_bonus,
        use_lm_pred=args.use_tfm_pred,
        use_lm_score=(args.use_tfm_score or bool(args.kenlm_path)),
        skip_search=args.skip_search,
        prune_log_prob=math.log(getattr(args, "prune", 0.001)))
    return BeamSearchDecoder(codec, lm or NullLM(), cfg)


class EvalSession:
    """Loaded model + decode pipeline shared by single/benchmark modes."""

    def __init__(self, args):
        import jax
        import jax.numpy as jnp
        from ..core.codec import CTCCodec
        from ..models.registry import get_model_info

        self.args = args
        input_path = args.input if os.path.isdir(args.input) else None
        self.model, characters = get_model_info(
            args.model_type, data_dir=input_path,
            chars_list_file=getattr(args, "chars_list", None),
            dtype=jnp.bfloat16)
        self.codec = CTCCodec(characters)
        self.variables = load_recognizer_variables(args.model_file)
        self.use_beam = args.decode_method == "beam-search"
        self.beam = build_beam_decoder(self.codec, args) if self.use_beam \
            else None
        # Decode-path routing: full (non-skip) search runs entirely on
        # device — no-LM via the fused Pallas top-K + scan search, JAX-LM
        # via the KV-cached LM-fused search. Skip-search and KenLM modes use
        # the host decoder with batched LM calls.
        from ..decode.lm_interface import JaxLMBackend, NullLM
        self.device_beam = (
            self.use_beam and isinstance(self.beam.lm, NullLM)
            and not args.skip_search
            and not getattr(args, "host_beam", False))
        self.device_lm_beam = (
            self.use_beam and isinstance(self.beam.lm, JaxLMBackend)
            and args.use_tfm_score
            and not getattr(args, "host_beam", False))
        # Host-beam configurations (skip search, KenLM/ARPA n-gram, no-LM
        # host fallback) upgrade to the native C++ decoder when its
        # library is built — transcription-identical to the Python host
        # decoder (tests/test_native_cbs.py), interpreter-loop-free.
        if self.use_beam and not self.device_beam and not self.device_lm_beam:
            from ..decode.beam_host_native import try_native_host_decoder
            native = try_native_host_decoder(
                self.codec, self.beam.cfg, lm=self.beam.lm,
                kenlm_path=getattr(args, "kenlm_path", ""))
            if native is not None:
                self.beam = native

        model = self.model
        unknown_id = self.codec.unknown_id

        # data-parallel decode (`-dp N`): lines are independent, so eval
        # shards the batch axis over a ``data`` mesh — the inference-side
        # counterpart of the reference's train-only DDP (`main.py:157-237`;
        # its test.py is single-device). Plain forwards partition via
        # GSPMD from the input sharding; the scan-based LM-fused search
        # goes through shard_map (decode/adaptive.py).
        ndp = int(getattr(args, "data_parallel", 0) or 0)
        self._mesh = None
        if ndp > 1:
            from ..parallel.mesh import make_mesh
            n_dev = len(jax.devices())
            if ndp > n_dev:
                raise ValueError(
                    f"--data-parallel {ndp} exceeds the {n_dev} visible "
                    f"devices")
            if args.batch_size % ndp != 0:
                raise ValueError(
                    f"--data-parallel {ndp} must divide the batch size "
                    f"{args.batch_size}")
            self._mesh = make_mesh(data=ndp, model=1,
                                   devices=jax.devices()[:ndp])

        # Weight residency: the loaders return HOST numpy trees (dtype
        # normalization happens on host), and a host tree passed to a jit
        # re-transfers every leaf on EVERY dispatch — ~150 MB of f32 at
        # b32/w1200 over the TPU tunnel, which round 4/5 measured as THE
        # serving ceiling (host-numpy vars 4828 ms/call = 6.6 lines/sec
        # vs device-resident 328 ms/call = 97.6). Commit the weights to
        # the device (replicated over the mesh when -dp) exactly once.
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self.variables = jax.device_put(
                self.variables, NamedSharding(self._mesh, PartitionSpec()))
        else:
            self.variables = jax.device_put(self.variables,
                                            jax.devices()[0])

        # int8 conv scales (``serve/quant.py``), calibrated lazily on the
        # first batch when --int8; passed as a jit ARGUMENT so the switch
        # from None to the calibrated tree retraces exactly once
        self._quant = None
        self.int8 = bool(getattr(args, "int8", False))
        from ..serve.quant import supports_quant as _supports_quant
        has_quant_path = _supports_quant(model)
        if self.int8 and not has_quant_path:
            raise ValueError(
                f"--int8: model '{args.model_type}' has no quantized "
                f"conv path")

        def apply_fwd(variables, x, quant):
            if has_quant_path:
                return model.apply(variables, x, train=False, quant=quant)
            return model.apply(variables, x, train=False)

        @jax.jit
        def forward(variables, x, quant=None):
            return apply_fwd(variables, x, quant)

        from ..ops.decode import greedy_decode_device

        @jax.jit
        def forward_greedy(variables, x, quant=None):
            logits = apply_fwd(variables, x, quant)
            return greedy_decode_device(logits, None, unknown_id=unknown_id)

        beam_size, depth = args.beam_size, args.search_depth
        len_bonus = args.len_bonus

        from ..decode.beam_device import (beam_search_fused,
                                          dense_merge_default)
        dense = dense_merge_default()

        @jax.jit
        def forward_beam(variables, x, quant=None):
            logits = apply_fwd(variables, x, quant)
            return beam_search_fused(
                logits, beam_size=beam_size, depth=depth,
                unknown_id=unknown_id, len_bonus=len_bonus,
                dense_merge=dense)

        self._forward = forward
        self._forward_greedy = forward_greedy
        self._forward_beam = forward_beam

        if self.device_lm_beam:
            from ..decode.adaptive import AdaptiveLMBeam
            from ..decode.beam_lm_device import make_id_tables
            from ..lm.cached import CachedLM
            from ..ops.topk_logsoftmax import topk_logsoftmax
            lm = self.beam.lm
            # bf16 LM compute/cache is the production default on TPU;
            # `--lm-f32` opts out (parity debugging)
            lm_dtype = (jnp.float32 if getattr(args, "lm_f32", False)
                        else jnp.bfloat16)
            clm = CachedLM(lm.lm_model, lm.lm_params, dtype=lm_dtype,
                           quant_int8=getattr(args, "lm_int8", False))
            c2l, l2c = make_id_tables(self.codec, lm.tokenizer)
            skip = bool(args.skip_search)
            if not skip:
                print("note: full (non-skip) LM-fused beam search is "
                      "~an order of magnitude slower than `-ss` "
                      "(skip-search, the reference's fast path) at equal "
                      "accuracy on peaky posteriors — consider adding -ss")
            import math
            prune_lp = math.log(getattr(args, "prune", 0.001))
            self._lm_adaptive = AdaptiveLMBeam(
                clm, c2l, l2c, beam_size=beam_size, depth=depth,
                unknown_id=unknown_id, lm_panelty=args.lm_panelty,
                len_bonus=len_bonus, use_lm_pred=args.use_tfm_pred,
                skip_search=skip,
                group_size=getattr(args, "lm_group", 8),
                lm_ctx=getattr(args, "lm_ctx", 0),
                seg_budget=getattr(args, "seg_budget", 0),
                run_max=getattr(args, "run_max", 8),
                ctx_ladder=getattr(args, "ctx_ladder", 112),
                fused_commit=getattr(args, "fused_commit", False),
                prune=prune_lp,
                mesh=self._mesh, verbose=True)

            @jax.jit
            def prep_lm_beam(variables, x, quant=None):
                logits = apply_fwd(variables, x, quant)
                cv, ci, blank_lp, n_above = topk_logsoftmax(
                    logits, k=depth, prune=prune_lp)
                logz = jax.scipy.special.logsumexp(
                    logits.astype(jnp.float32), axis=-1)
                return cv, ci, logits, logz, blank_lp, n_above

            # two dispatches: the adaptive decoder jits separately, and
            # nesting it inside another jit trips pjit const handling —
            # decode_batch_async chains them
            self._prep_lm_beam = prep_lm_beam

    # ------------------------------------------------------------- decode
    def decode_batch_async(self, images_nhwc: np.ndarray):
        """Dispatch a batch; returns ``finalize() -> (texts, seconds)``.

        The device work starts immediately; everything host-side (D2H of
        the decoded indices, the overflow check on the LM path, string
        conversion) happens inside ``finalize``. Callers that delay a
        batch's ``finalize`` until after the NEXT batch is dispatched
        overlap that host tail with device compute — the pipelining that
        took the greedy bench path from ~84 to ~103 lines/sec
        (`bench.py`) — while plain ``decode_batch`` keeps the
        dispatch-then-finalize semantics of the reference hot loop."""
        import jax.numpy as jnp
        x = jnp.asarray(images_nhwc)
        if self._mesh is not None:
            import jax
            from ..parallel.mesh import batch_sharding
            x = jax.device_put(x, batch_sharding(self._mesh))
        t0 = time.time()
        if self.int8 and self._quant is None:
            from ..serve.quant import calibrate_for_model
            self._quant = calibrate_for_model(self.model, self.variables,
                                              [x])
        if self.use_beam and self.device_lm_beam:
            outs = self._prep_lm_beam(self.variables, x, self._quant)
            pending = self._lm_adaptive.decode_async(*outs)

            def finalize():
                prefixes, lengths = pending.result()
                texts = self.codec.compact_to_texts(prefixes, lengths)
                return texts, time.time() - t0
        elif self.use_beam and self.device_beam:
            prefixes, lengths = self._forward_beam(self.variables, x,
                                                   self._quant)

            def finalize():
                texts = self.codec.compact_to_texts(prefixes, lengths)
                return texts, time.time() - t0
        elif self.use_beam:
            logits_dev = self._forward(self.variables, x, self._quant)

            def finalize():
                logits = np.asarray(logits_dev)
                texts = self.beam.decode(logits.transpose(1, 0, 2))
                return texts, time.time() - t0
        else:
            chars, lengths = self._forward_greedy(self.variables, x,
                                                  self._quant)

            def finalize():
                texts = self.codec.compact_to_texts(chars, lengths)
                return texts, time.time() - t0
        return finalize

    def decode_batch(self, images_nhwc: np.ndarray) -> Tuple[List[str], float]:
        """(B, H, W, 1) normalized f32 -> texts, elapsed seconds."""
        return self.decode_batch_async(images_nhwc)()


def run_single(args) -> None:
    """Single image / ad-hoc folder mode (`test.py:163-201`).

    The pad width is rounded up to a serving bucket so a fresh compilation
    cache pays at most one XLA compile per bucket — not one per distinct
    image width (the reference pads to the dynamic batch max,
    `test.py:174-186`, which is free under torch but a multi-minute
    compile per width under XLA)."""
    from ..data.bucketing import BucketSpec, default_buckets, \
        normalize_pad_batch
    from ..data.dataset import read_resize_image

    session = EvalSession(args)
    h = session.model.img_height

    if os.path.isfile(args.input):
        files = [args.input]
    else:
        files = [os.path.join(args.input, f)
                 for f in sorted(os.listdir(args.input))
                 if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))]
    images = [read_resize_image(f, h) for f in files]

    max_w = max(im.shape[1] for im in images)
    spec = BucketSpec(default_buckets(
        max(256, -(-max_w // 256) * 256), step=256))
    bs = args.batch_size
    for i in range(0, len(images), bs):
        chunk = images[i: i + bs]
        maxW = spec.bucket_for(max(im.shape[1] for im in chunk))
        batch, _ = normalize_pad_batch(chunk, maxW)
        texts, dt = session.decode_batch(batch)
        print(f"max_width: {maxW}, throughput: "
              f"{dt / len(chunk) * 1000:.2f} ms/img")
        for f, t in zip(files[i: i + bs], texts):
            print(f"file:\t{f}\npred:\t{t}")


def run_benchmark(args) -> float:
    """Test-set CER benchmark (`test.py:230-306`); returns CER."""
    from ..data.bucketing import AlignCollate, BucketSpec
    from ..data.dataset import ImageDataset
    from ..data.loader import DataLoader
    from .metrics import cer_counts

    if not os.path.isdir(args.input):
        raise AssertionError("Input should be a folder under benchmark mode.")

    session = EvalSession(args)
    model = session.model
    dataset = ImageDataset(args.input, (1, model.img_height), "test",
                           batch_size=args.batch_size)
    collate = AlignCollate(imgH=model.img_height, PAD=model.pad_mode,
                           bucket_spec=BucketSpec())
    loader = DataLoader(dataset, args.batch_size, collate,
                        num_workers=args.workers)

    dist_sum, len_sum, n_img = 0, 0, 0
    t_first = None  # wall clock from the first dispatch: with one batch
    # in flight, per-batch finalize intervals overlap, so summing them
    # would double-count; pipeline throughput is the honest metric

    full_lm_search = session.device_lm_beam and not args.skip_search

    def consume(entry):
        nonlocal dist_sum, len_sum, n_img
        i, finalize, labels = entry
        texts, _ = finalize()
        n_img += len(texts)
        if i == 0 and full_lm_search and len(loader) > 1:
            # Product stance (README "Full vs skip search"): the full
            # search scans every frame while `-ss` scans ~segments, a
            # measured ~25x gap at production shapes — escalate the
            # startup note with this run's own projection so the cost
            # is visible before the user waits it out.
            per_batch = time.time() - t_first
            proj = per_batch * len(loader)
            print(f"note: full search measured {per_batch:.1f} s/batch on "
                  f"this run — projected {proj / 60:.1f} min for all "
                  f"{len(loader)} batches. `-ss` (skip search, the "
                  f"reference's fast path) is ~25x faster and CER-equal "
                  f"on peaky posteriors; consider rerunning with -ss.")
        d, t = cer_counts(texts, labels)
        dist_sum += d
        len_sum += t
        if args.test_verbose:
            for p, g in zip(texts, labels):
                print(f"PRE: {p}\nTRU: {g}")
        if (i + 1) % args.print_freq == 0:
            elapsed = time.time() - t_first
            print(f"[{i + 1}/{len(loader)}] CER so far: "
                  f"{dist_sum / max(len_sum, 1):.4f} "
                  f"({elapsed / max(n_img, 1) * 1000:.1f} ms/img wall)")

    # one batch in flight: batch i's host tail (D2H, strings, CER) runs
    # while batch i+1 computes on device
    prev = None
    for i, batch in enumerate(loader):
        if t_first is None:
            t_first = time.time()
        finalize = session.decode_batch_async(batch["images"])
        if prev is not None:
            consume(prev)
        prev = (i, finalize, list(batch["labels"]))
    if prev is not None:
        consume(prev)
    cer = dist_sum / max(len_sum, 1)
    print(f"Total Test CER: {cer}")
    return cer
