from ..config import test_args
from .test_driver import main

if __name__ == '__main__':
    main(test_args())
