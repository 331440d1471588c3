"""Convert Planetoid / OGB link-prediction datasets to ocn_tpu's offline
`.npz` format (run in an environment with the raw data / network access):

    python scripts/convert_datasets.py Cora Citeseer Pubmed collab ppa ddi citation2

Produces dataset/<name>.npz consumed by ocn_tpu.data.loaders.loaddataset.
Mirrors the reference's dataset-download entry point (ogbdataset.py:73-79).
"""
import sys

import numpy as np


def convert(name: str) -> None:
    from ocn_tpu.data.loaders import LinkDataset, save_npz

    if name in ("Cora", "Citeseer", "Pubmed"):
        from torch_geometric.datasets import Planetoid

        dataset = Planetoid(root="dataset", name=name)
        data = dataset[0]
        n = data.x.shape[0]
        ei = data.edge_index.numpy()
        ds = LinkDataset(
            name=name, x=data.x.numpy(), max_x=-1,
            edge_index=ei, split_edge={}, n_nodes=n,
        )
    else:
        from ogb.linkproppred import PygLinkPropPredDataset

        dataset = PygLinkPropPredDataset(name=f"ogbl-{name}", root="dataset")
        split = dataset.get_edge_split()
        data = dataset[0]
        n = data.num_nodes
        split_np = {
            p: {k: np.asarray(v) for k, v in d.items()} for p, d in split.items()
        }
        x = data.x.numpy() if data.x is not None else np.zeros((n,), np.int32)
        ds = LinkDataset(
            name=name, x=x, max_x=-1, edge_index=data.edge_index.numpy(),
            split_edge=split_np, n_nodes=n,
        )
    save_npz(f"dataset/{name}.npz", ds)
    print(f"wrote dataset/{name}.npz")


if __name__ == "__main__":
    for nm in sys.argv[1:] or ["Cora"]:
        convert(nm)
