from .config import Config, ConfigDict, get_test_config, get_train_config, merge_dict
from .logger import (AvgMeter, CSVLogger, IndentedLog, bolded_log, get_root_logger,
                     log_dict_items)
from .path import PathHandler, iter2str
from .registry import (CONTEXTMODEL_REGISTRY, DATASET_REGISTRY, DECODER_REGISTRY,
                       DISCRIMINATOR_REGISTRY, ENCODER_REGISTRY, ENTROPYMODEL_REGISTRY,
                       HYPERDECODER_REGISTRY, HYPERENCODER_REGISTRY, LOSS_REGISTRY,
                       METRIC_REGISTRY, MODEL_REGISTRY, OPTIMIZER_REGISTRY,
                       SCHEDULER_REGISTRY, TRAINER_REGISTRY, Registry)
from .timer import Timer
