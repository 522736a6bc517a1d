"""CI smoke test: execute every python code block of
docs/getting_started.md, in order, in one shared namespace — the
getting-started walkthrough must stay runnable hermetically on CPU
(reference analog: notebooks/Getting_started_wfsim.ipynb, which the
reference never executes in CI; here it is a first-class test)."""
import os
import re

DOC = os.path.join(os.path.dirname(__file__), '..', 'docs',
                   'getting_started.md')


def test_getting_started_doc_executes():
    with open(DOC) as f:
        text = f.read()
    blocks = re.findall(r'```python\n(.*?)```', text, flags=re.S)
    assert len(blocks) >= 8, 'doc lost its code blocks?'
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f'{DOC}#block{i}', 'exec'), ns)
        except Exception as e:
            raise AssertionError(
                f'getting_started.md block {i} failed: {e}\n---\n{block}')
    # the walkthrough produced real output
    assert len(ns['rr']) > 0
    assert len(ns['truth']) == 4
    assert os.path.exists('/tmp/wfsim_tpu_getting_started_waveform.png')
