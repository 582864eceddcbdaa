"""Typed configuration for geossl_tpu.

The reference exposes one module-level argparse namespace shared by every
script (``examples/config.py:1-215``). Here the same surface is a set of
frozen dataclasses with per-task presets mirroring the published
hyperparameters from the reference's ``scripts/`` sweeps.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class SchNetConfig:
    """SchNet hyperparameters (reference ``Geom3D/models/schnet.py:17-30`` and
    CLI defaults ``examples/config.py:111-115``)."""

    hidden_channels: int = 128
    num_filters: int = 128
    num_interactions: int = 6
    num_gaussians: int = 51  # CLI default is 51 (class default was 50)
    cutoff: float = 10.0
    node_class: int = 9
    readout: str = "mean"  # {"mean", "add"}


@dataclass(frozen=True)
class PaiNNConfig:
    """PaiNN hyperparameters (reference ``Geom3D/models/painn.py:125-142`` and
    CLI defaults ``examples/config.py:118-121``)."""

    n_atom_basis: int = 128  # == emb_dim in the reference scripts
    n_interactions: int = 3
    n_rbf: int = 20
    cutoff: float = 5.0
    n_out: int = 1
    readout: str = "add"  # {"mean", "add"}
    max_z: int = 9  # node_class passed as max_z (pretrain_GeoSSL.py:39)
    shared_interactions: bool = False
    shared_filters: bool = False
    epsilon: float = 1e-8


@dataclass(frozen=True)
class ModelConfig:
    model_3d: str = "schnet"  # {"schnet", "painn"}
    emb_dim: int = 128
    schnet: SchNetConfig = field(default_factory=SchNetConfig)
    painn: PaiNNConfig = field(default_factory=PaiNNConfig)
    # Numerics: parameters are always f32; activations may run in bf16.
    compute_dtype: str = "float32"  # {"float32", "bfloat16"}
    # SchNet filter-MLP matmul precision: 'bf16' feeds the MXU half-precision
    # operands (f32 accumulation, ~1e-3 drift) while everything else stays
    # f32. Measured NEUTRAL on v5e at N=32 and N=512 (docs/PERF.md) — the
    # fused kernel is not matmul-rate-bound there; kept for other hardware.
    filter_mxu: str = "f32"  # {"f32", "bf16"}
    # Fused Pallas kernels (+10-150% step speed on TPU depending on N;
    # both kernels support second-order AD, so MD17 forces run fused too).
    use_pallas: bool = False
    # Checkpoint-parity cap on neighbors per atom (torch_cluster's default
    # max_num_neighbors=32, ``Geom3D/models/schnet.py:91``): keep the k
    # NEAREST in-cutoff neighbors. None (default) keeps full neighborhoods
    # — the documented, strictly-more-informative delta; set 32 to match
    # released-checkpoint connectivity at LBA/LEP density.
    max_neighbors: Optional[int] = None
    # Occupancy-gated ("block-sparse") pair tiles in the fused kernels: empty
    # tiles (out-of-cutoff + padding; ~half of all tiles at Atom3D density)
    # skip their whole compute body via scalar-prefetched flags. "auto"
    # enables them at N>=128 pair grids; identical outputs either way.
    sparse_tiles: str = "auto"  # {"auto", "on", "off"}
    # Pair-grid model parallelism: mesh axis name the [B,N,N] message
    # computation shards over (parallel/pair_parallel.py). The apply must
    # then run inside shard_map over that axis. None = unsharded.
    pair_axis: Optional[str] = None

    def __post_init__(self):
        # argparse validates CLI input; this catches direct construction with
        # a typo (e.g. 'bf-16'), which would otherwise silently run f32.
        if self.filter_mxu not in ("f32", "bf16"):
            raise ValueError(
                f"filter_mxu must be 'f32' or 'bf16', got {self.filter_mxu!r}"
            )
        if self.model_3d not in ("schnet", "painn"):
            raise ValueError(f"model_3d must be 'schnet' or 'painn', "
                             f"got {self.model_3d!r}")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype must be 'float32' or 'bfloat16', "
                             f"got {self.compute_dtype!r}")
        if self.sparse_tiles not in ("auto", "on", "off"):
            raise ValueError(f"sparse_tiles must be 'auto', 'on' or 'off', "
                             f"got {self.sparse_tiles!r}")
        if self.max_neighbors is not None and self.max_neighbors <= 0:
            raise ValueError(f"max_neighbors must be positive or None "
                             f"('no cap' is None), got {self.max_neighbors}")

    @property
    def backbone(self):
        return self.schnet if self.model_3d == "schnet" else self.painn


@dataclass(frozen=True)
class GeoSSLConfig:
    """GeoSSL pretraining knobs (``examples/config.py:148-158``)."""

    option: str = "DDM"  # {"DDM", "EBM_NCE", "InfoNCE", "RR"}
    mu: float = 0.0  # view-noise mean     (GeoSSL_mu)
    sigma: float = 0.3  # view-noise stddev (GeoSSL_sigma)
    atom_masking_ratio: float = 0.3  # BFS subgraph mask ratio
    # NCSN / denoising distance matching (SM_* flags):
    sm_sigma_begin: float = 10.0
    sm_sigma_end: float = 0.01
    sm_num_noise_level: int = 50
    sm_noise_type: str = "symmetry"  # {"symmetry", "random"}
    sm_anneal_power: float = 2.0
    # Contrastive:
    T: float = 0.1  # InfoNCE temperature (config.py:171)
    normalize: bool = False
    # RR autoencoder:
    ae_loss: str = "l2"  # {"l1", "l2", "cosine"}
    detach_target: bool = True
    # beta (config.py:182) weights the KL term of GraphMVP's VAE variant;
    # the plain AutoEncoder the RR objective uses ignores it, as upstream.
    beta: float = 1.0


@dataclass(frozen=True)
class SSLHeadConfig:
    """Baseline SSL objective knobs (``examples/config.py:123-130``)."""

    charge_masking_ratio: float = 0.3
    distance_sample_ratio: float = 1.0
    torsion_angle_sample_ratio: float = 0.001


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "QM9"
    task: str = "alpha"
    data_root: str = "data"
    # Padded bucket sizes; every batch's atom axis is padded to one of these.
    bucket_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    # Train-split z-normalization of targets is applied by the drivers.
    split: str = "customized_01"
    seed: int = 42


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 128
    md17_train_batch_size: int = 5  # scripts/finetune/submit_finetune_md17_*.sh
    epochs: int = 100
    lr: float = 1e-4
    decay: float = 0.0  # Adam weight decay
    lr_scheduler: str = "CosineAnnealingLR"  # or "none", "StepLR"
    lr_decay_factor: float = 0.5
    lr_decay_step_size: int = 100
    min_lr: float = 1e-6
    loss: str = "mae"  # {"mae", "mse"} for regression fine-tunes
    md17_energy_coeff: float = 0.05
    md17_force_coeff: float = 0.95
    seed: int = 42
    eval_batch_size: int = 128
    # parallelism
    num_data_shards: int = 1  # data-parallel devices


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    geossl: GeoSSLConfig = field(default_factory=GeoSSLConfig)
    ssl: SSLHeadConfig = field(default_factory=SSLHeadConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    output_model_dir: str = ""
    input_model_file: str = ""

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets mirroring the reference's SLURM sweeps (SURVEY.md §2.7).
# ---------------------------------------------------------------------------

def preset_pretrain_ddm(model_3d: str = "schnet") -> Config:
    """GeoSSL-DDM pretraining on Molecule3D
    (``scripts/pretrain_GeoSSL_DDM/submit_pretrain_GeoSSL_DDM.sh:2-28``)."""
    return Config(
        model=ModelConfig(model_3d=model_3d),
        geossl=GeoSSLConfig(option="DDM"),
        data=DataConfig(dataset="Molecule3D_1000000"),
        train=TrainConfig(batch_size=128, epochs=100, lr=5e-4),
    )


def preset_finetune_qm9(model_3d: str = "schnet", task: str = "mu") -> Config:
    """QM9 fine-tune (``scripts/finetune/submit_finetune_qm9_schnet.sh:6-16``)."""
    return Config(
        model=ModelConfig(model_3d=model_3d),
        data=DataConfig(dataset="QM9", task=task, split="customized_01"),
        train=TrainConfig(batch_size=128, epochs=1000, lr=5e-4, loss="mae"),
    )


def preset_finetune_md17(model_3d: str = "schnet", task: str = "aspirin") -> Config:
    """MD17 fine-tune (``scripts/finetune/submit_finetune_md17_schnet.sh:9-19``)."""
    return Config(
        model=ModelConfig(model_3d=model_3d),
        data=DataConfig(dataset="MD17", task=task),
        train=TrainConfig(
            batch_size=128, md17_train_batch_size=5, epochs=1000, lr=5e-4
        ),
    )


def preset_finetune_lba(model_3d: str = "schnet") -> Config:
    """Atom3D LBA (``scripts/finetune/submit_finetune_lba_lep_schnet.sh:8-33``)."""
    return Config(
        model=ModelConfig(model_3d=model_3d),
        data=DataConfig(dataset="LBA", split="atom3d_lba_split30"),
        train=TrainConfig(batch_size=64, epochs=300, lr=1e-4),
    )


def preset_finetune_lep(model_3d: str = "schnet") -> Config:
    """Atom3D LEP (``scripts/finetune/submit_finetune_lba_lep_schnet.sh:28-33``)."""
    return Config(
        model=ModelConfig(model_3d=model_3d),
        data=DataConfig(dataset="LEP"),
        train=TrainConfig(batch_size=16, epochs=300, lr=1e-4),
    )
