CXX ?= g++
CXXFLAGS ?= -O3 -march=native -fPIC -shared -fopenmp -std=c++17

all: orphics_tpu/csrc/liborphics_healpix.so

orphics_tpu/csrc/liborphics_healpix.so: orphics_tpu/csrc/healpix.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

test:
	python -m pytest tests/ -q

clean:
	rm -f orphics_tpu/csrc/*.so
