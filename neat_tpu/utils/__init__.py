from .chunking import split_input, merge_output
from .cache import enable_compilation_cache
from .meters import AverageMeter
