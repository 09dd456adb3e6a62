from setuptools import find_packages, setup

setup(
    name="gsalign-tpu",
    version="0.1.0",
    packages=find_packages(exclude=("tests", "native", "tools")),
    python_requires=">=3.10",
    entry_points={"console_scripts": [
        "gsalign-tpu = gsalign_tpu.cli:main",
    ]},
)
