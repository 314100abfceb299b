"""Cross-implementation e2e parity harness.

Runs the ACTUAL reference implementation (``/root/reference/federated_main.py``,
PyTorch, on CPU) and the rebuilt CLI (``/root/repo/federated_main.py``, JAX) on
the SAME synthetic FairFedMed fixture from the SAME initial weights, and
compares per-round accuracy/AUC trajectories plus the final per-client states.

How the runs are made comparable:

* **Backbone weights** — a synthetic tiny ViT CLIP checkpoint with the
  reference's exact key naming (``make_synthetic_checkpoint``); values are
  fp16-representable so the reference's fp16→fp32 round trip
  (clip/model.py:609-630 then ``clip_model.float()``) is lossless.  The
  reference loads it through its own ``clip.build_model`` (``_download``
  monkeypatched to the local file); the rebuild loads it through
  ``models/converter.py`` via ``find_checkpoint``.
* **Trainable init** — the reference trainer is built first and its freshly
  initialised trainables (prompt ctx ~ torch randn, lora_B ~ torch randn) are
  dumped and injected into the rebuilt trainer (layouts are identical by
  design: lora_A [in,r], lora_S [G,r], lora_B [r,out]).
* **Data order** — per-client train-set size equals the batch size, so each
  local epoch is ONE full batch and the (torch vs numpy) shuffle permutation
  is irrelevant: mean-CE gradients are permutation-invariant.  Eval runs in
  index order on both sides.
* **Hyperparameters** — fp32, SGD with momentum 0, OT=None, LR constant
  (stepsize beyond the horizon), λ_fairness 0 (the reference's regulariser is
  detached anyway, GLP_OT_SVLoRA.py:924,943).

The reference's absent deps (yacs, ftfy, prettytable, fairlearn, aif360,
torchvision, skimage, gdown, timm) are backed by ``install_shims()``:
yacs ← ``fairfedmed_tpu.config.CfgNode`` (yacs-compatible by construction),
fairlearn/aif360 ← ``fairfedmed_tpu.evaluation.metrics`` (reimplemented by
definition, unit-tested) — note both sides then share the SAME metric code,
so the comparison isolates model/train/aggregation differences; everything
else is import-surface-only (the parity configs never call into them:
NO_TRANSFORM is on, exactly as the reference's own launch scripts
effectively run — their ``--input_no_transform False`` parses True through
``type=bool``, scripts/fairfedlora_fairfedmed.sh:31,71).

Usage:  python tools/ref_parity.py [--rounds 3] [--out /tmp/parity]
          [--backbone RN50] [--modality oct_bscans] [--dataset FedChexMimic]
          [--OT Sinkhorn|COT] [--all]
        (CPU-only; ~1-3 min per axis on a 1-core host)

Reference map: federated_main.py:604-726 (FedOTPLoRA branch),
trainers/GLP_OT_SVLoRA.py:767-1054, utils/fed_utils.py:42-100.
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import re
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_ROOT = os.environ.get("FFM_REFERENCE", "/root/reference")

# Dassl Logger tees whose __del__ would close the real stdout (see
# run_reference); parked here so they are never garbage-collected
_TEES_KEPT_ALIVE = []

# ----------------------------------------------------------------- shims


def _mod(name: str, **attrs) -> types.ModuleType:
    """Create/register a module (linking it as an attribute of its parent)."""
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent not in sys.modules:
            _mod(parent)
        setattr(sys.modules[parent], leaf, m)
    return m


def install_shims() -> None:
    """Back the reference's missing third-party imports.  Idempotent."""
    if "yacs" in sys.modules:
        return
    sys.path.insert(0, REPO)
    from fairfedmed_tpu.config import CfgNode
    from fairfedmed_tpu.evaluation import metrics as M

    _mod("yacs.config", CfgNode=CfgNode)
    _mod("ftfy", fix_text=lambda s: s)

    class PrettyTable:
        """Minimal prettytable: the reference only builds param-count tables
        (utils/fed_utils.py:103-114) and prints them."""

        def __init__(self, field_names=None):
            self.field_names = list(field_names or [])
            self._rows = []

        def add_row(self, row):
            self._rows.append(list(row))

        def __str__(self):
            rows = [self.field_names] + [[str(c) for c in r] for r in self._rows]
            widths = [max(len(str(r[i])) for r in rows) for i in range(len(rows[0]))]
            fmt = " | ".join("{:%d}" % w for w in widths)
            return "\n".join(fmt.format(*[str(c) for c in r]) for r in rows)

    _mod("prettytable", PrettyTable=PrettyTable)

    _mod("fairlearn.metrics",
         demographic_parity_difference=M.demographic_parity_difference,
         demographic_parity_ratio=M.demographic_parity_ratio,
         equalized_odds_difference=M.equalized_odds_difference,
         equalized_odds_ratio=M.equalized_odds_ratio)
    _mod("aif360.sklearn.metrics",
         average_odds_difference=M.average_odds_difference)

    def _no_resize(*a, **k):
        raise NotImplementedError(
            "skimage shim: parity fixtures must already match the model "
            "resolution (the reference resizes only on mismatch, "
            "utils/data_utils.py:669-673)")

    _mod("skimage.transform", resize=_no_resize)

    def _no_egress(*a, **k):
        raise RuntimeError("gdown shim: no network in the parity environment")

    _mod("gdown", download=_no_egress, cached_download=_no_egress)

    # --- torchvision: import-surface only.  The parity runs use
    # NO_TRANSFORM (as the reference's shipped scripts effectively do), so
    # no transform object is ever CALLED — only constructed/imported.
    class _Never:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise NotImplementedError(
                "torchvision shim object used at runtime — the parity "
                "config must keep INPUT.NO_TRANSFORM on")

    class InterpolationMode:
        BILINEAR, BICUBIC, NEAREST = "bilinear", "bicubic", "nearest"
        BOX, HAMMING, LANCZOS = "box", "hamming", "lanczos"

    tfm_names = ["Resize", "Compose", "ToTensor", "Normalize", "CenterCrop",
                 "RandomCrop", "ColorJitter", "RandomApply", "GaussianBlur",
                 "RandomGrayscale", "RandomResizedCrop", "RandomHorizontalFlip",
                 "RandomVerticalFlip", "Lambda", "Pad", "RandomRotation"]
    func = _mod("torchvision.transforms.functional",
                InterpolationMode=InterpolationMode,
                **{n: _no_egress for n in
                   ("resize", "crop", "hflip", "to_tensor", "normalize")})
    _mod("torchvision.transforms", functional=func,
         InterpolationMode=InterpolationMode,
         **{n: type(n, (_Never,), {}) for n in tfm_names})
    ds_utils = _mod("torchvision.datasets.utils",
                    download_file_from_google_drive=_no_egress,
                    check_integrity=lambda *a, **k: False,
                    download_and_extract_archive=_no_egress,
                    extract_archive=_no_egress,
                    verify_str_arg=lambda v, *a, **k: v)
    vision = _mod("torchvision.datasets.vision",
                  VisionDataset=type("VisionDataset", (_Never,), {}))
    _mod("torchvision.datasets", utils=ds_utils, vision=vision,
         **{n: type(n, (_Never,), {}) for n in
            ("MNIST", "CIFAR10", "CIFAR100", "SVHN", "FashionMNIST",
             "CelebA", "ImageFolder")})
    _mod("torchvision", transforms=sys.modules["torchvision.transforms"],
         datasets=sys.modules["torchvision.datasets"])

    import torch.nn as nn

    _mod("timm.models.vision_transformer",
         VisionTransformer=type("VisionTransformer", (nn.Module,), {}))


# ------------------------------------------------- synthetic checkpoint


class _FP16RNG:
    """numpy Generator facade whose normals are fp16-representable, making the
    reference's fp16 conversion (clip/model.py:609-630) + ``.float()`` a
    lossless round trip, bit-identical to the rebuild's direct fp32 load."""

    def __init__(self, rng):
        self._rng = rng

    def standard_normal(self, shape):
        import numpy as np

        return (self._rng.standard_normal(shape).astype(np.float16) / 8.0
                ).astype(np.float32)


def make_synthetic_checkpoint(path: str, seed: int = 0):
    """Tiny ViT CLIP state_dict with the reference's exact key naming, saved
    as a torch file both loaders accept (reference: torch.jit.load fails →
    torch.load state_dict, trainers/GLP_OT_SVLoRA.py:29-34; rebuild:
    models/converter.py:load_torch_state_dict)."""
    import numpy as np
    import torch

    from fairfedmed_tpu.models.clip_model import CLIPConfig
    from tests.test_converter import make_torch_style_sd

    cfg = CLIPConfig(embed_dim=64, image_resolution=224, vision_layers=2,
                     vision_width=64, vision_patch_size=32, context_length=77,
                     vocab_size=49408, transformer_width=64,
                     transformer_heads=1, transformer_layers=2)
    sd = make_torch_style_sd(cfg, _FP16RNG(np.random.default_rng(seed)))
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    return cfg


def make_synthetic_rn_checkpoint(path: str, seed: int = 0):
    """Tiny ModifiedResNet CLIP checkpoint.  Built by instantiating the
    REFERENCE's own CLIP class (clip/model.py, imported by file path) so the
    key inventory satisfies its strict load, then overwriting every tensor
    with seeded fp16-representable values (running_var kept positive)."""
    import importlib.machinery

    import numpy as np
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_clip_model_gen", os.path.join(REF_ROOT, "clip", "model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    design = {"trainer": "Golden", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = mod.CLIP(
        embed_dim=64, image_resolution=224, vision_layers=(1, 1, 1, 1),
        vision_width=16, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=64, transformer_heads=1,
        transformer_layers=2, design_details=design)
    rng = _FP16RNG(np.random.default_rng(seed))
    sd = {}
    for k, v in model.state_dict().items():
        arr = rng.standard_normal(tuple(v.shape))
        if k.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        elif k.endswith("num_batches_tracked"):
            arr = np.zeros(v.shape, np.int64)
        elif k == "logit_scale":
            arr = np.float32(2.6593)
        sd[k] = torch.from_numpy(np.asarray(arr).reshape(v.shape)).to(v.dtype)
    model.load_state_dict(sd, strict=True)

    # CALIBRATE the BatchNorm running statistics: with random stats the eval
    # forward divides each stage by an over-large sqrt(var), and the input
    # signal decays ~10x per stage — by layer4 the logits are constant to
    # 1e-7 and AUC is tie-noise.  Two train-mode batches with momentum=1
    # adopt realistic per-stage statistics instead.
    for m in model.visual.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    model.visual.train()
    with torch.no_grad():
        gen = torch.Generator().manual_seed(seed)
        for _ in range(2):
            model.visual(torch.randn(8, 3, 224, 224, generator=gen))
    model.visual.eval()
    torch.save(model.state_dict(), path)


# ------------------------------------------------------------ run args


def _common_args(parser_mod, root, outdir, rounds, seed,
                 backbone="ViT-B/16", modality="slo_fundus", dim3d=2,
                 lr=0.001, ot="None", dataset="FairFedMed",
                 model="FedOTPLoRA"):
    args = parser_mod.build_arg_parser().parse_args([])
    if ot != "None":
        # sharpen the transport plan: at eps=0.1 a random-init similarity
        # matrix is flat and the OT plan collapses to uniform — OT would be
        # "validated" without ever shaping the logits.  eps below ~0.03
        # underflows K=exp(-(1-sim)/eps) to zero at random init: the plan
        # goes NaN and the reference CRASHES (its forward returns None,
        # GLP_OT_SVLoRA.py:738-743, which forward_backward never guards).
        args.eps = 0.05
        args.top_percent = 0.8
    if model == "CLIP":
        trainer = "CLIP"
    elif model in ("PromptFL", "fedprox"):
        trainer = "PromptFL"
    else:
        trainer = "GLP_OT_SVLoRA"
    for k, v in dict(
        model=model, trainer=trainer, round=rounds, num_users=2,
        frac=1.0, lr=lr, root=root, output_dir=outdir, seed=seed,
        train_batch_size=16, test_batch_size=16, n_ctx=4, num_prompt=2,
        avg_prompt=1, OT=ot, backbone=backbone, attribute_type="race",
        attributes=["gender", "race", "ethnicity", "language", "maritalstatus"],
        modality_type=modality, dim_per_3d_slice=dim3d,
        unfreeze_image_encoder=True,
        input_no_transform=True, stepsize=10000,
        lora_rank=12, lora_alpha=2.0, lora_type="FairLoRA", shared_half_s=True,
        lambda_fairness=0.0, config_file="", dataset_config_file="",
        resume=None,
    ).items():
        setattr(args, k, v)
    if model == "CLIP":
        # the reference's zero-shot PromptLearner requires a truthy CTX_INIT
        # (clip.py:88-98: prompt_prefix is unbound otherwise) and hard-codes
        # the prefix to "a photo of a" regardless of the value; pass the
        # string so the rebuilt trainer embeds the same words
        args.ctx_init = "a photo of a"
        args.unfreeze_image_encoder = False
    if dataset == "FedChexMimic":
        args.attributes = ["race", "gender", "age"]
    args.opts = ["DATASET.NAME", dataset, "INPUT.SIZE", "(224, 224)",
                 "SEED", str(seed), "TEST.EVALUATOR", "Classification_oph",
                 "TRAINER.GLP_OT.PREC", "fp32", "TRAINER.PROMPTFL.PREC", "fp32",
                 "OPTIM.NAME", "sgd", "OPTIM.MOMENTUM", "0.0",
                 "DATALOADER.NUM_WORKERS", "0",
                 "INPUT.PIXEL_MEAN", "[0.48145466, 0.4578275, 0.40821073]",
                 "INPUT.PIXEL_STD", "[0.26862954, 0.26130258, 0.27577711]"]
    return args


# trainable/federated leaves compared across implementations: prompt ctx,
# LoRA factors, the 3D slice projector, and (RN backbones) the trainable
# BatchNorm affine + federated running statistics
_TRAINABLE_PAT = re.compile(
    r"prompt_learner\.ctx|lora_[ASB]|proj_per_3d_slice"
    r"|image_encoder\.(stem\.)?bn\d\.|\.bn\d\.|downsample\.1\.|downsample_bn")


def _is_compared_key(key: str) -> bool:
    """Trainable/federated leaves compared across implementations;
    num_batches_tracked is torch BN bookkeeping with no counterpart here."""
    return bool(_TRAINABLE_PAT.search(key)) and not key.endswith(
        "num_batches_tracked")


def _ref_key_to_ours(key: str) -> str:
    """Reference RN state_dict naming → the rebuild's naming.  The stem BNs
    live at the visual top level in the reference (clip/model.py:172-180,
    exported as ``image_encoder.bn1.*``) but under ``stem.`` here, and the
    downsample Sequential's BN index 1 is named ``downsample_bn``."""
    key = re.sub(r"^image_encoder\.(bn\d)\.", r"image_encoder.stem.\1.", key)
    return key.replace(".downsample.1.", ".downsample_bn.")


# ------------------------------------------------------- reference side


def run_reference(root: str, ckpt: str, outdir: str, rounds: int,
                  seed: int = 1, **cfg_kw):
    """Run /root/reference/federated_main.py:main on the fixture.  Returns
    (per-round acc list, per-round auc list, initial trainable state dict,
    final per-client states)."""
    import numpy as np
    import torch

    install_shims()
    if not torch.cuda.is_available() and not getattr(torch.Tensor.cuda,
                                                     "_parity_noop", False):
        # the reference's CLIP trainer hard-codes .cuda() in its forward
        # (clip.py:221-222) — identity on the CPU-only parity host
        def _cuda_noop(self, *a, **k):
            return self

        _cuda_noop._parity_noop = True
        torch.Tensor.cuda = _cuda_noop
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # the reference's ``datasets`` dir has no __init__.py (namespace
    # package), so HuggingFace ``datasets`` in site-packages would win the
    # import — pin an explicit package module at the reference path.  Then
    # pre-seed ``datasets.WangGrant``, a module the reference does not ship
    # (SURVEY §2.5: build.py:13 imports it and would ImportError).
    if "datasets.WangGrant" not in sys.modules:
        import importlib.machinery

        pkg = types.ModuleType("datasets")
        pkg.__path__ = [os.path.join(REF_ROOT, "datasets")]
        pkg.__spec__ = importlib.machinery.ModuleSpec(
            "datasets", None, is_package=True)
        pkg.__spec__.submodule_search_locations = pkg.__path__
        sys.modules["datasets"] = pkg
        _mod("datasets.WangGrant",
             WangGrant=type("WangGrant", (), {"dataset_dir": "wanggrant"}))

    spec = importlib.util.spec_from_file_location(
        "ref_federated_main", os.path.join(REF_ROOT, "federated_main.py"))
    ref_fm = importlib.util.module_from_spec(spec)
    sys.modules["ref_federated_main"] = ref_fm
    spec.loader.exec_module(ref_fm)

    import clip.clip as ref_clip  # the REFERENCE clip package

    ref_clip._download = lambda url, root=None: ckpt

    # pin classname ORDER: the reference stores classnames as python sets
    # (datasets/FairFedMed.py:48, FedChexMimic.py:48) whose iteration order
    # is hash-dependent
    import datasets.FairFedMed as ref_ffm
    import datasets.FedChexMimic as ref_fcm

    for mod, cls_name, names in (
            (ref_ffm, "FairFedMed", ["NOT Glaucoma", "Glaucoma"]),
            (ref_fcm, "FedChexMimic",
             ["NOT Pleural Effusion", "Pleural Effusion"])):
        cls = getattr(mod, cls_name)
        if getattr(cls, "_parity_patched", False):
            continue
        orig_init = cls.__init__

        def _patched(self, cfg, _orig=orig_init, _names=names):
            _orig(self, cfg)
            self.classnames = list(_names)

        cls.__init__ = _patched
        cls._parity_patched = True

    # capture the freshly-built trainer's initial trainables (and keep a
    # handle on the trainer for the post-run prob sweep)
    captured = {}
    holder = {}
    ref_build = ref_fm.build_trainer

    def build_and_dump(cfg):
        trainer = ref_build(cfg)
        holder["trainer"] = trainer
        captured.update({
            _ref_key_to_ours(k): v.detach().cpu().numpy().copy()
            for k, v in trainer.model.state_dict().items()
            if _is_compared_key(k)})
        return trainer

    ref_fm.build_trainer = build_and_dump

    # the reference builds argparse inline under __main__; reuse the
    # rebuilt parser — the CLI schema is identical by design
    sys.path.insert(0, REPO)
    import federated_main as our_fm

    args = _common_args(our_fm, root, outdir, rounds, seed, **cfg_kw)

    # a reused outdir still holds the previous run's log.txt — the Dassl
    # logger would then write THIS run to a timestamped sibling
    # (log.txt-<date>) and _parse_log would read the stale trajectories
    for stale in glob.glob(os.path.join(outdir, "log.txt*")):
        os.remove(stale)

    saved_stdout = sys.stdout
    try:
        ref_fm.main(args)
    except UnboundLocalError as e:
        # reference bug: the fedavg/fedprox/local/CLIP branches never bind
        # all_users, so the final-save loop (federated_main.py:775) crashes
        # AFTER every round trained and evaluated; the log and the trainer's
        # end state carry everything the comparison needs
        if "all_users" not in str(e):
            raise
        print(f"reference ended with its known fedprox bug: {e}",
              file=saved_stdout)
    finally:
        # the Dassl logger tees stdout to log.txt through a buffered handle
        # it never closes — flush it so the round-1+ metric lines land.
        # KEEP the tee alive afterwards: Logger.__del__ → close() closes
        # self.console — the REAL stdout — on garbage collection
        # (Dassl/dassl/utils/logger.py:34-57)
        tee = sys.stdout
        if getattr(tee, "file", None) is not None:
            tee.file.flush()
            _TEES_KEPT_ALIVE.append(tee)
        sys.stdout = saved_stdout

    accs, aucs = _parse_log(os.path.join(outdir, "log.txt"))
    finals, probs = [], []
    trainer = holder["trainer"]
    for idx in range(args.num_users):
        p = os.path.join(outdir, f"global_client{idx}_final.pth")
        state = torch.load(p, map_location="cpu") if os.path.exists(p) else {}
        if not state:
            # fedavg/fedprox save the personalization store UNPOPULATED
            # (reference federated_main.py:775-778 writes local_weights_per,
            # which those branches never fill) — the trainer still holds the
            # final global from the last round's eval loads
            state = trainer.model.state_dict()
        finals.append({_ref_key_to_ours(k): v.detach().cpu().numpy()
                       for k, v in state.items() if _is_compared_key(k)})
        # final-state per-sample eval probabilities: the tie-robust
        # equivalence (AUC flips on sub-1e-6 prob ties; probabilities don't).
        # Follows the trainer's own test protocol (SimpleTrainer.test,
        # trainer.py:541-551): GLP trainers parse a 4-tuple and thread the
        # target attr; PromptFL parses (input, label) and infers attr-free.
        trainer.model.load_state_dict(state, strict=False)
        trainer.set_model_mode("eval")
        pr, lab = [], []
        with torch.no_grad():
            for b in trainer.fed_test_loader_x_dict[idx]:
                parsed = trainer.parse_batch_test(b)
                out = (trainer.model_inference(parsed[0], parsed[3])
                       if len(parsed) >= 4 else
                       trainer.model_inference(parsed[0]))
                pr.append(torch.softmax(out.float(), -1)[:, 1].numpy())
                lab.append(parsed[1].numpy())
        probs.append((np.concatenate(pr), np.concatenate(lab)))
    return accs, aucs, captured, finals, probs


def _parse_log(path: str):
    accs, aucs = [], []
    with open(path) as f:
        for line in f:
            m = re.match(r"Global test acc: ([0-9.eE+-]+)", line)
            if m:
                accs.append(float(m.group(1)))
            m = re.match(r"Global test auc: ([0-9.eE+-]+)", line)
            if m:
                aucs.append(float(m.group(1)))
    return accs, aucs


# --------------------------------------------------------- rebuilt side


def run_ours(root: str, outdir: str, rounds: int, init_state: dict,
             seed: int = 1, parallel: bool = False, **cfg_kw):
    """Run the rebuilt CLI on the fixture, injecting the reference's initial
    trainables after build (key names and layouts coincide by design; RN
    BatchNorm names pre-translated by the caller via _ref_key_to_ours)."""
    import numpy as np

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import federated_main as our_fm

    args = _common_args(our_fm, root, outdir, rounds, seed, **cfg_kw)
    args.parallel_clients = parallel

    our_build = our_fm.build_trainer
    holder = {}

    def build_and_inject(cfg):
        trainer = our_build(cfg)
        holder["trainer"] = trainer
        trainer.load_state_dict(dict(init_state), strict=False)
        return trainer

    our_fm.build_trainer = build_and_inject
    try:
        out = our_fm.main(args)
    finally:
        our_fm.build_trainer = our_build

    trainer = holder["trainer"]
    finals, probs = [], []
    for idx in range(args.num_users):
        z = np.load(os.path.join(outdir, f"global_client{idx}_final.npz"))
        state = {k: z[k] for k in z.files}
        finals.append({k: v for k, v in state.items()
                       if _is_compared_key(k)})
        trainer.load_state_dict(state, strict=False)
        pr, lab = [], []
        for b in trainer.fed_test_loader_x_dict[idx]:
            parsed = trainer.parse_batch_test(b)
            tgt = parsed[3] if len(parsed) >= 4 else None
            lg = np.asarray(trainer.model_inference(parsed[0], tgt),
                            np.float32)
            labels = parsed[1]
            n_valid = int(b.get("n_valid", len(np.asarray(labels))))
            sm = np.exp(lg - lg.max(-1, keepdims=True))
            sm = sm / sm.sum(-1, keepdims=True)
            pr.append(sm[:n_valid, 1])
            lab.append(np.asarray(labels)[:n_valid])
        probs.append((np.concatenate(pr), np.concatenate(lab)))
    return out["acc"], out["auc"], finals, probs


# -------------------------------------------------------------- compare


def compare(ref, ours, atol_metric=0.01, rtol_state=1e-4, atol_state=1e-6,
            atol_prob=5e-5, trained=True, compare_states=True,
            compare_probs=True):
    """Returns a report dict; raises AssertionError on mismatch.

    The PRIMARY equivalence is per-sample: final-state eval probabilities
    must agree to ``atol_prob`` on every test sample.  Metric-level AUC is
    ALSO asserted strictly on every axis — fixtures are generated so no two
    probabilities tie within implementation noise (a rank flip would move
    AUC by 1/(n₊·n₋)), so an AUC gap means a real rank divergence.

    ``trained=False`` (CLIP zero-shot: no trainable state at all in the
    reference's model) skips the train-movement guard; ``compare_states=False``
    skips the final-state sweep (CLIP: the reference PromptLearner keeps its
    embedding as a plain attribute, so state_dict carries NO compared keys);
    ``compare_probs=False`` additionally skips the per-sample sweep (local
    branch: NEITHER side persists the per-client local states — the reference
    saves its never-populated personalization store, federated_main.py:775 —
    so final-state eval is not meaningful; the acc trajectory is the
    comparison)."""
    import numpy as np

    ref_acc, ref_auc, _, ref_finals, ref_probs = ref
    our_acc, our_auc, our_finals, our_probs = ours
    # AUC must be reported by both sides or neither (PromptFL on medical
    # data drops attrs at parse_batch_test on both implementations)
    assert (len(ref_auc) == 0) == (len(our_auc) == 0), \
        f"AUC reported on only one side: ref {len(ref_auc)} vs ours {len(our_auc)}"
    assert len(ref_acc) == len(our_acc) and len(ref_auc) == len(our_auc), \
        (f"round counts differ: acc {len(ref_acc)} vs {len(our_acc)}, "
         f"auc {len(ref_auc)} vs {len(our_auc)}")
    report = {
        "ref_acc": ref_acc, "our_acc": our_acc,
        "ref_auc": ref_auc, "our_auc": our_auc,
        "acc_max_delta": float(np.max(np.abs(np.asarray(ref_acc)
                                             - np.asarray(our_acc)))),
        "auc_max_delta": (float(np.max(np.abs(np.asarray(ref_auc)
                                              - np.asarray(our_auc))))
                          if ref_auc else 0.0),
    }

    if compare_probs:
        prob_deltas = []
        for idx, ((rpr, rlab), (opr, olab)) in enumerate(zip(ref_probs, our_probs)):
            assert np.array_equal(rlab, olab), \
                f"client {idx}: eval label sequence differs"
            assert rpr.shape == opr.shape, f"client {idx}: prob count differs"
            prob_deltas.append(float(np.abs(rpr - opr).max()))
        report["eval_prob_max_delta"] = max(prob_deltas)
        assert report["eval_prob_max_delta"] <= atol_prob, report

    assert report["acc_max_delta"] <= atol_metric, report
    # STRICT on every axis: fixtures are scaled so no two eval probabilities
    # tie within implementation noise (see make_synthetic_rn_checkpoint's
    # logit_scale note) — an AUC gap now means a real rank divergence
    assert report["auc_max_delta"] <= atol_metric, report

    # training must have MOVED the state — identical-but-untrained runs
    # (e.g. a zero-lr bug on both sides) must not pass as parity
    init = ref[2]
    if trained:
        moved = max(
            float(np.max(np.abs(np.asarray(rf[k], np.float64)
                                - np.asarray(init[k], np.float64))))
            for rf in ref_finals for k in rf if k in init)
        assert moved > 1e-6, f"reference state never moved from init ({moved=})"
        report["train_movement"] = moved

    if not compare_states:
        return report

    state_deltas = {}
    for idx, (rf, of) in enumerate(zip(ref_finals, our_finals)):
        common = sorted(set(rf) & set(of))
        assert common, f"client {idx}: no common trainable keys"
        missing = sorted(set(rf) - set(of))
        assert not missing, f"client {idx}: keys absent from rebuild: {missing[:4]}"
        for k in common:
            a, b = np.asarray(rf[k], np.float64), np.asarray(of[k], np.float64)
            if a.ndim == b.ndim - 1 and b.shape[0] == 1:
                b = b[0]  # PromptFL ctx: reference [n_ctx,d] vs bank [1,n_ctx,d]
            assert a.shape == b.shape, f"client {idx} {k}: {a.shape} vs {b.shape}"
            d = float(np.max(np.abs(a - b)))
            scale = float(np.max(np.abs(a))) or 1.0
            state_deltas[f"c{idx}:{k}"] = d
            assert d <= atol_state + rtol_state * scale, \
                f"client {idx} {k}: max|Δ|={d:.3e} (scale {scale:.3e})"
    report["state_max_delta"] = max(state_deltas.values())
    report["n_state_keys"] = len(state_deltas)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="/tmp/ref_parity")
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--n-test", type=int, default=16)
    ap.add_argument("--fixture-seed", type=int, default=0,
                    help="dataset fixture rng seed")
    ap.add_argument("--ckpt-seed", type=int, default=0,
                    help="synthetic checkpoint rng seed (RN50 axis: seeds "
                         "are screened so no two eval probabilities land "
                         "within implementation noise — a near-tie flips a "
                         "rank and moves AUC by 1/(n+*n-) without any real "
                         "divergence)")
    ap.add_argument("--backbone", choices=["ViT-B/16", "RN50"],
                    default="ViT-B/16",
                    help="RN50 exercises the ModifiedResNet path: FairLoRA "
                         "on 1x1 convs, attnpool LoRA, trainable+federated "
                         "BatchNorm (affine AND running stats)")
    ap.add_argument("--modality", choices=["slo_fundus", "oct_bscans"],
                    default="slo_fundus",
                    help="oct_bscans exercises the 3D path: [::4] subsample, "
                         "proj_per_3d_slice, per-slice lora_S repeat, "
                         "slice-mean logits")
    ap.add_argument("--all", action="store_true",
                    help="run every parity axis (ViT 2D, OCT-3D, RN50, "
                         "FedChexMimic, Sinkhorn, COT) and write a combined "
                         "report to <out>/report_all.json")
    ap.add_argument("--model", choices=["FedOTPLoRA", "FedOTPLinearFT",
                                        "FedOTP", "fedavg", "fedprox",
                                        "local", "CLIP"],
                    default="FedOTPLoRA",
                    help="aggregation branch (reference federated_main.py: "
                         "CLIP eval-only :223-267, fedavg :269-324, fedprox "
                         ":326-382, PromptFL/FedOTP :384-485, FedOTPLinearFT "
                         ":487-602, FedOTPLoRA :604-726, local :728-773). "
                         "fedprox runs the PromptFL trainer — the ONLY path "
                         "where the reference's PromptFL trainer can train "
                         "at all (its non-fedprox run_epoch call passes "
                         "is_last_client, which PromptFL.forward_backward "
                         "rejects with a TypeError; Dassl trainer.py:702, "
                         "promptfl.py:276). CLIP compares the zero-shot "
                         "eval probabilities; local compares the acc "
                         "trajectory only (neither side persists per-client "
                         "local states, see compare())")
    ap.add_argument("--dataset", choices=["FairFedMed", "FedChexMimic"],
                    default="FairFedMed",
                    help="FedChexMimic exercises the CheXpert+MIMIC JPEG "
                         "pipeline (grayscale decode, race/gender/age "
                         "attribute tables)")
    ap.add_argument("--OT", choices=["None", "Sinkhorn", "COT"],
                    default="None", dest="ot",
                    help="optimal-transport plan between patch tokens and "
                         "prompts (reference GLP_OT_SVLoRA.py:615-675; here "
                         "a lax.while_loop fixed point — iteration-count "
                         "parity is SURVEY hard-part #1)")
    ap.add_argument("--atol-metric", type=float, default=0.01,
                    help="max |Δ| on per-round acc (percent) / auc (percent)")
    opts = ap.parse_args(argv)

    if opts.all:
        axes = {
            "vit_2d": [],
            "oct_3d": ["--modality", "oct_bscans"],
            # ckpt-seed 1: screened so no two eval probabilities land within
            # implementation noise (seed 0 had a round-0 near-tie whose rank
            # flip moved AUC by 1/(n+*n-)=0.83; seeds 1-3 all strict-pass)
            "rn50": ["--backbone", "RN50", "--ckpt-seed", "1"],
            "fedchexmimic": ["--dataset", "FedChexMimic"],
            "sinkhorn": ["--OT", "Sinkhorn"],
            "cot": ["--OT", "COT"],
            "fedavg": ["--model", "fedavg"],
            "fedprox": ["--model", "fedprox"],
            "fedotp": ["--model", "FedOTP"],
            "fedotp_linft": ["--model", "FedOTPLinearFT"],
            "local": ["--model", "local"],
            "clip_zeroshot": ["--model", "CLIP"],
        }
        import subprocess

        combined = {}
        for name, extra in axes.items():
            sub_out = os.path.join(opts.out, name)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--rounds", str(opts.rounds), "--out", sub_out,
                 "--n-train", str(opts.n_train), "--n-test", str(opts.n_test),
                 "--atol-metric", str(opts.atol_metric), *extra],
                capture_output=True, text=True)
            ok = proc.returncode == 0 and "PARITY OK" in proc.stdout
            combined[name] = {"ok": ok}
            if ok:
                with open(os.path.join(sub_out, "report.json")) as f:
                    r = json.load(f)
                combined[name].update({k: r[k] for k in
                                       ("acc_max_delta", "auc_max_delta",
                                        "eval_prob_max_delta",
                                        "state_max_delta") if k in r})
            else:
                combined[name]["tail"] = "\n".join(
                    (proc.stdout + proc.stderr).splitlines()[-8:])
            print(f"[{name}] {'PARITY OK' if ok else 'FAILED'}", flush=True)
        os.makedirs(opts.out, exist_ok=True)
        with open(os.path.join(opts.out, "report_all.json"), "w") as f:
            json.dump(combined, f, indent=2)
        print(json.dumps(combined, indent=2))
        if not all(v["ok"] for v in combined.values()):
            sys.exit(1)
        return combined

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from tests.fixtures import make_fairfedmed_fixture, make_fedchexmimic_fixture

    os.makedirs(opts.out, exist_ok=True)
    root = os.path.join(opts.out, "data")
    if opts.dataset == "FedChexMimic":
        if not os.path.isdir(os.path.join(root, "fedchexmimic")):
            make_fedchexmimic_fixture(root, n_train=opts.n_train,
                                      n_test=opts.n_test, size=224)
    elif not os.path.isdir(os.path.join(root, "fairfedmed")):
        # oct_bscans: depth 16 subsamples [::4] to 4 channels = 2 slices at
        # DIM_PER_3D_SLICE=2; H=W=224 so neither side resizes (the reference
        # would call skimage on mismatch, shimmed to raise)
        oct_kw = (dict(oct_depth=16, oct_hw=224)
                  if opts.modality == "oct_bscans" else
                  dict(oct_depth=4, oct_hw=8))
        make_fairfedmed_fixture(root, n_sites=2, n_train=opts.n_train,
                                n_test=opts.n_test, size=224,
                                seed=opts.fixture_seed, **oct_kw)
    if opts.backbone == "RN50":
        ckpt = os.path.join(root, "RN50.pt")
        if not os.path.exists(ckpt):
            make_synthetic_rn_checkpoint(ckpt, seed=opts.ckpt_seed)
    else:
        ckpt = os.path.join(root, "ViT-B-16.pt")
        if not os.path.exists(ckpt):
            make_synthetic_checkpoint(ckpt)
    cfg_kw = dict(backbone=opts.backbone, modality=opts.modality, ot=opts.ot,
                  dataset=opts.dataset, model=opts.model)

    print("== running reference (torch, CPU) ==", flush=True)
    ref = run_reference(root, ckpt, os.path.join(opts.out, "ref"), opts.rounds,
                        **cfg_kw)
    print(f"reference: acc={ref[0]} auc={ref[1]}", flush=True)
    print("== running rebuild (jax, CPU, sequential) ==", flush=True)
    ours = run_ours(root, os.path.join(opts.out, "ours"), opts.rounds, ref[2],
                    **cfg_kw)
    print(f"rebuild:   acc={ours[0]} auc={ours[1]}", flush=True)
    print("== running rebuild (jax, CPU, --parallel_clients mesh) ==", flush=True)
    ours_par = run_ours(root, os.path.join(opts.out, "ours_par"), opts.rounds,
                        ref[2], parallel=True, **cfg_kw)
    print(f"mesh:      acc={ours_par[0]} auc={ours_par[1]}", flush=True)

    cmp_kw = dict(atol_metric=opts.atol_metric,
                  trained=opts.model != "CLIP",
                  compare_states=opts.model not in ("CLIP", "local"),
                  compare_probs=opts.model != "local")
    report = compare(ref, ours, **cmp_kw)
    par_report = compare(ref, ours_par, **cmp_kw)
    report["parallel_acc_max_delta"] = par_report["acc_max_delta"]
    report["parallel_auc_max_delta"] = par_report["auc_max_delta"]
    if "state_max_delta" in par_report:
        report["parallel_state_max_delta"] = par_report["state_max_delta"]
    with open(os.path.join(opts.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("PARITY OK")
    return report


if __name__ == "__main__":
    main()
