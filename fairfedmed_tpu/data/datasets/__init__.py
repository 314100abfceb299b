from .cifar import Cifar10, Cifar100
from .domain import DomainNet, Office
from .fairfedmed import FairFedMed, FairFedMedDataset
from .fedchexmimic import FedChexMimic, FedChexMimicDataset
from .generic import (
    CharacterDataset, FashionMnist, Femnist, Mnist, Svhn,
)
from .wanggrant import WangGrant, WangGrantDataset
from .fewshot import (
    Caltech101, DescribableTextures, Food101, OxfordFlowers, OxfordPets,
)

__all__ = [
    "FairFedMed",
    "FairFedMedDataset",
    "FedChexMimic",
    "FedChexMimicDataset",
    "Cifar10",
    "Cifar100",
    "Caltech101",
    "OxfordPets",
    "OxfordFlowers",
    "Food101",
    "DescribableTextures",
    "DomainNet",
    "Office",
    "Mnist",
    "FashionMnist",
    "Svhn",
    "Femnist",
    "CharacterDataset",
    "WangGrant",
    "WangGrantDataset",
]
