"""Training loops (stage drivers' inner machinery).

The reference owns each training loop inline in its stage script
(``s2_registration.py:196-338``, ``s3_appearance.py:105-204``). Here the
jit-able core of each loop lives in ``training/`` and the stage scripts are
thin frame/phase orchestrators.
"""
