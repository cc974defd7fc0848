"""Import the ACTUAL reference torch modules from /root/reference for
cross-implementation parity tests (SURVEY.md §7 hard part 6, VERDICT r1 #5).

The reference depends on packages absent from this image (hydra, omegaconf,
pytorch_lightning, librosa, numba, xformers, flash-attn CUDA extensions...).
The *core module math* (FFTransformer, HiFi-GAN Generator) only needs torch,
so we install minimal stubs for everything else and import the reference
source files unmodified.  Nothing here copies reference code — it only makes
the reference importable so tests can run its real forward pass.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _mod(name: str, **attrs) -> types.ModuleType:
    m = sys.modules.get(name)
    if m is None:
        import importlib.machinery

        m = types.ModuleType(name)
        m.__path__ = []  # mark as package so submodule imports resolve
        m.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    # register on the parent package so `from a import b` works
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, m)
    return m


def install_reference_stubs() -> None:
    """Install stub modules for the reference's unavailable dependencies."""
    if "omegaconf" in sys.modules and hasattr(sys.modules["omegaconf"], "__roar_tpu_stub__"):
        return  # already installed

    # ---- omegaconf ----------------------------------------------------
    class _DictConfig(dict):
        pass

    class _OmegaConf:
        @staticmethod
        def create(obj=None):
            return _DictConfig(obj or {})

        @staticmethod
        def to_container(cfg, resolve=True):
            return dict(cfg)

        @staticmethod
        def is_config(obj):
            return isinstance(obj, _DictConfig)

        @staticmethod
        def register_new_resolver(*a, **k):
            pass

        @staticmethod
        def set_struct(*a, **k):
            pass

        @staticmethod
        def merge(*cfgs):
            out = {}
            for c in cfgs:
                out.update(dict(c or {}))
            return _DictConfig(out)

    om = _mod(
        "omegaconf",
        DictConfig=_DictConfig,
        ListConfig=list,
        OmegaConf=_OmegaConf,
        open_dict=lambda cfg: cfg,
        MISSING="???",
    )
    om.__roar_tpu_stub__ = True
    _mod(
        "omegaconf.omegaconf",
        OmegaConf=_OmegaConf,
        DictConfig=_DictConfig,
        open_dict=om.open_dict,
    )
    _mod("omegaconf.errors", OmegaConfBaseException=Exception)

    # ---- hydra --------------------------------------------------------
    hydra = _mod("hydra")
    _mod("hydra.utils", instantiate=lambda *a, **k: None, get_class=lambda p: None)
    _mod("hydra._internal")
    _mod(
        "hydra._internal.utils",
        _run_hydra=lambda *a, **k: None,
        get_args_parser=lambda *a, **k: None,
    )
    _mod("hydra.core")
    _mod("hydra.core.config_store", ConfigStore=type(
        "ConfigStore", (), {"instance": staticmethod(lambda: types.SimpleNamespace(store=lambda *a, **k: None))}
    ))
    _mod("hydra.types", TaskFunction=object, RunMode=None)
    _mod("hydra.core.hydra_config", HydraConfig=type("HydraConfig", (), {}))
    hydra.utils = sys.modules["hydra.utils"]

    # ---- pytorch_lightning -------------------------------------------
    import torch

    class _LightningModule(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def save_hyperparameters(self, *a, **k):
            pass

        @property
        def trainer(self):
            return getattr(self, "_trainer", None)

    class _Trainer:
        def __init__(self, *a, **k):
            pass

    def _rank_zero_only(fn):
        return fn

    import logging as _logging

    pl = _mod(
        "pytorch_lightning",
        LightningModule=_LightningModule,
        Trainer=_Trainer,
        Callback=object,
        __version__="2.0.0-stub",
        _logger=_logging.getLogger("pytorch_lightning_stub"),
    )
    _mod("pytorch_lightning.utilities", model_summary=None, rank_zero_only=_rank_zero_only)
    _mod("pytorch_lightning.utilities.model_summary")
    _mod(
        "pytorch_lightning.utilities.rank_zero",
        rank_zero_only=_rank_zero_only,
        rank_zero_info=lambda *a, **k: None,
        rank_zero_warn=lambda *a, **k: None,
    )
    _mod(
        "pytorch_lightning.utilities.exceptions",
        MisconfigurationException=type("MisconfigurationException", (Exception,), {}),
    )
    _mod("pytorch_lightning.utilities.types", STEP_OUTPUT=None)
    _mod(
        "pytorch_lightning.loggers",
        Logger=object,
        WandbLogger=type("WandbLogger", (), {}),
        TensorBoardLogger=type("TensorBoardLogger", (), {}),
        MLFlowLogger=type("MLFlowLogger", (), {}),
    )
    _mod("pytorch_lightning.callbacks", Callback=object, ModelCheckpoint=type("ModelCheckpoint", (), {}))
    _mod("pytorch_lightning.loggers.logger", Logger=object)
    _mod("pytorch_lightning.loggers.wandb", WandbLogger=type("WandbLogger", (), {}))
    _mod("pytorch_lightning.loggers.tensorboard", TensorBoardLogger=type("TensorBoardLogger", (), {}))
    _mod("pytorch_lightning.trainer")
    _mod("pytorch_lightning.trainer.trainer", Trainer=_Trainer)
    _mod(
        "pytorch_lightning.trainer.connectors",
    )
    _mod(
        "pytorch_lightning.trainer.connectors.checkpoint_connector",
        _CheckpointConnector=type("_CheckpointConnector", (), {}),
    )
    _mod("pytorch_lightning.core", LightningModule=_LightningModule)
    _mod(
        "pytorch_lightning.core.module",
        LightningModule=_LightningModule,
        _jit_is_scripting=False,
    )
    _mod(
        "pytorch_lightning.plugins",
        precision=None,
    )
    _mod(
        "pytorch_lightning.strategies",
        Strategy=object,
        DDPStrategy=type("DDPStrategy", (), {}),
        StrategyRegistry=type("StrategyRegistry", (), {"register": staticmethod(lambda *a, **k: None)}),
    )
    _mod(
        "pytorch_lightning.plugins.environments",
        LightningEnvironment=type("LightningEnvironment", (), {}),
        ClusterEnvironment=type("ClusterEnvironment", (), {}),
        TorchElasticEnvironment=type("TorchElasticEnvironment", (), {}),
    )
    pl.utilities = sys.modules["pytorch_lightning.utilities"]

    # ---- lightning_utilities ------------------------------------------
    class _RequirementCache:
        """Always-unavailable requirement: forces reference fallback paths
        (SDPA instead of flash-attn, etc.)."""

        def __init__(self, *a, **k):
            pass

        def __bool__(self):
            return False

    _mod("lightning_utilities")
    _mod("lightning_utilities.core")
    _mod("lightning_utilities.core.imports", RequirementCache=_RequirementCache)

    # ---- xformers -----------------------------------------------------
    class _SwiGLU(torch.nn.Module):
        """Reference formula: w3(silu(w1 x) * w2 x) — only instantiated by
        the FlashTransformer path, which these tests never run."""

        def __init__(self, in_features, hidden_features, bias=False, **kw):
            super().__init__()
            self.w1 = torch.nn.Linear(in_features, hidden_features, bias=bias)
            self.w2 = torch.nn.Linear(in_features, hidden_features, bias=bias)
            self.w3 = torch.nn.Linear(hidden_features, in_features, bias=bias)

        def forward(self, x):
            return self.w3(torch.nn.functional.silu(self.w1(x)) * self.w2(x))

    _mod("xformers")
    _mod("xformers.ops", SwiGLU=_SwiGLU)

    # ---- CUDA extension shims (imported unguarded; never called) ------
    _mod("dropout_layer_norm")
    _mod("rotary_emb")
    _mod("flash_attn")
    _mod("xentropy_cuda_lib")

    # ---- librosa ------------------------------------------------------
    # helpers.py only imports it, but the training-step equivalence tests
    # RUN the reference FilterbankFeatures, whose __init__ builds the mel
    # filterbank via librosa.filters.mel (features.py:298-308).  Our
    # mel_filterbank is the same slaney math (pinned by torch.stft golden
    # tests), so back the stub with it.
    def _librosa_mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None,
                     htk=False, norm="slaney", dtype=None):
        from roar_tpu.ops.spectrogram import mel_filterbank

        return mel_filterbank(
            sample_rate=sr, n_fft=n_fft, n_mels=n_mels, fmin=fmin,
            fmax=fmax, norm=norm, htk=htk,
        )

    librosa = _mod("librosa")
    librosa.stft = None
    _mod("librosa.core")
    _mod("librosa.filters", mel=_librosa_mel)
    librosa.filters = sys.modules["librosa.filters"]

    # ---- numba: @jit/@prange must behave as pass-throughs -------------
    def _jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]

        def deco(fn):
            return fn

        return deco

    _mod("numba", jit=_jit, njit=_jit, prange=range)
    _mod("numba.cuda", jit=_jit, is_available=lambda: False)

    # ---- matplotlib.pylab alias used by helpers.py --------------------
    try:
        import matplotlib

        matplotlib.use("Agg", force=True)
    except Exception:
        pass

    # ---- huggingface_hub: present but newer; restore removed names ----
    try:
        import huggingface_hub

        for name in ("ModelFilter", "HfFolder"):
            if not hasattr(huggingface_hub, name):
                setattr(huggingface_hub, name, type(name, (), {}))
    except ImportError:
        _mod(
            "huggingface_hub",
            HfApi=type("HfApi", (), {}),
            HfFolder=type("HfFolder", (), {}),
            ModelFilter=type("ModelFilter", (), {}),
            hf_hub_download=lambda *a, **k: None,
        )
        _mod("huggingface_hub.hf_api", ModelInfo=type("ModelInfo", (), {}))

    # ---- misc ---------------------------------------------------------
    _mod("onnx")
    _mod("onnxruntime")
    _mod("sentencepiece", SentencePieceProcessor=type("SentencePieceProcessor", (), {}))
    _mod("inflect", engine=lambda: types.SimpleNamespace(
        number_to_words=lambda x, **k: str(x)))
    _mod("text_unidecode", unidecode=lambda s: s)
    _mod("wget", download=lambda *a, **k: None)
    _mod("wandb")
    _mod(
        "soundfile",
        read=None,
        write=None,
        SoundFile=None,
        available_formats=lambda: {},  # features.py -> segment.py probes codecs
    )

    # ---- Python 3.12 dataclass strictness -----------------------------
    # The reference (written for older Python) uses dataclass instances as
    # field defaults; 3.12 raises "mutable default ... not allowed".  Only
    # for cases that would raise, rewrite the default to a default_factory.
    import copy as _copy
    import dataclasses as _dc

    if not getattr(_dc, "__roar_tpu_tolerant__", False):
        _orig_get_field = _dc._get_field

        def _tolerant_get_field(cls, a_name, a_type, *rest):
            try:
                return _orig_get_field(cls, a_name, a_type, *rest)
            except ValueError:
                default = getattr(cls, a_name)
                setattr(
                    cls,
                    a_name,
                    _dc.field(default_factory=lambda d=default: _copy.copy(d)),
                )
                return _orig_get_field(cls, a_name, a_type, *rest)

        _dc._get_field = _tolerant_get_field
        _dc.__roar_tpu_tolerant__ = True

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # ---- bypass broken aggregator __init__ chains ---------------------
    # The reference's collection __init__s import every model eagerly and
    # some are broken in the reference itself (e.g. modules/jets.py imports
    # a nonexistent MultiHeadCrossAttn; models/vits.py imports a missing
    # vits_losses — SURVEY.md §2.7).  Register path-only packages so leaf
    # modules import directly without running those aggregators.
    import importlib.machinery as _machinery
    import os as _os

    for dotted in (
        "roar.collections.tts",
        "roar.collections.tts.models",  # its __init__ imports the broken jets.py
        "roar.collections.nlp",
        "roar.collections.common",
        "roar.collections.asr",
    ):
        if dotted in sys.modules:
            continue
        fs_path = _os.path.join(REFERENCE_ROOT, *dotted.split("."))
        m = types.ModuleType(dotted)
        m.__path__ = [fs_path]
        m.__spec__ = _machinery.ModuleSpec(dotted, None, is_package=True)
        m.__spec__.submodule_search_locations = [fs_path]
        sys.modules[dotted] = m


def import_reference_module(dotted: str):
    """install stubs + import e.g. 'roar.collections.tts.modules.transformer'."""
    install_reference_stubs()
    import importlib

    return importlib.import_module(dotted)
