from .metrics import AverageMeter, confusion_matrix, metrics_from_confusion
from .logger import setup_logger
