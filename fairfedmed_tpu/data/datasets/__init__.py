from .cifar import Cifar10, Cifar100
from .fairfedmed import FairFedMed, FairFedMedDataset
from .fedchexmimic import FedChexMimic, FedChexMimicDataset

__all__ = [
    "FairFedMed",
    "FairFedMedDataset",
    "FedChexMimic",
    "FedChexMimicDataset",
    "Cifar10",
    "Cifar100",
]
