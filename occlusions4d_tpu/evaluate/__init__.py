'''Inference engine + test driver.'''

from .inference import load_models, InferenceEngine, perform_inference, squash_eval
from .test_driver import run_test, main, backfill_from_train
