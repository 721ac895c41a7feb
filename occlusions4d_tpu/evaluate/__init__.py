'''Inference engine + test driver + offline results/metrics tooling.'''

from .inference import load_models, InferenceEngine, perform_inference, squash_eval
from .test_driver import run_test, main, backfill_from_train
from .results import (find_test_result_files, load_test_results,
                      merge_steps_into_long)
from .metrics import frame_metrics, evaluate_results, chamfer_distance
