'''Data plane: GREATER + CARLA-4D readers, loader factory, synthetic fixtures.'''

from .greater import GreaterDataset
from .carla import CarlaDataset
from .loader import Loader, collate, create_train_val_loaders, create_test_loader
from . import synthetic
