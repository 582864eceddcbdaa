from geossl_tpu.data.batch import DenseMolBatch, DualMolBatch, stack_batch
from geossl_tpu.data.bucketing import BucketedLoader, pack_batch, pick_bucket
from geossl_tpu.data.masking import apply_bfs_mask, bfs_subgraph_indices, make_bfs_transform
from geossl_tpu.data.store import MolRecord, MolStore
from geossl_tpu.data import splitters
from geossl_tpu.data.qm9 import load_qm9
from geossl_tpu.data.md17 import load_md17
from geossl_tpu.data.molecule3d import load_molecule3d
from geossl_tpu.data.lba import load_lba
from geossl_tpu.data.lep import load_lep
