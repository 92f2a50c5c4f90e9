// pjrt_bench — standalone C++ benchmark runner over the PJRT C API.
//
// TPU-era analog of the reference's C++ harness
// (/root/reference/kernels/hgemm/utils/utils.h:6-91 perf_gemm + the makefile
// bins, hgemm_mma_stage.cu:1965-2002): drive the compiled kernel without any
// Python on the hot path, for numbers free of binding overhead
// (/root/reference/kernels/hgemm/README.md:154 notes C++ runs slightly faster
// than the torch bindings — same motivation here).
//
// Usage:
//   pjrt_bench <plugin.so> <module.mlir> <manifest.txt> [iters] \
//       [-o name=s:strval | -o name=i:intval ...] \
//       [--check <oracle.mlir> [--tol <max_abs_err>]]
//
// `--check` is the numeric-verification mode — the analog of the reference's
// C++ gemm_error_check_{nn,tn} (/root/reference/kernels/hgemm/utils/
// utils.h:93-152,216-278, run from the HGEMM_MMA_DEBUG-built main): compile a
// SECOND module (the XLA oracle exported by tools/export_stablehlo.py
// --oracle), execute both on the SAME input buffers (real [-1,1] values, not
// the timing byte-fill), read every output back, and print max/mean abs
// error; exit 1 if max_err > --tol + --rtol * max|oracle| (defaults 1e-3 +
// 1e-2 — a few output-dtype ulps; bench/gemm_bench.py --check semantics).
//
// `-o` pairs become PJRT_NamedValue client-create options. When the plugin
// path contains "axon" and no -o is given, the axon terminal defaults are
// applied (topology from PALLAS_AXON_TPU_GEN, fresh session id, remote
// compile), mirroring the sitecustomize registration.
//
// The module is StableHLO text exported by tools/export_stablehlo.py, which
// also writes the manifest:
//   arg  <dtype> <d0>x<d1>...      (one per program argument)
//   flops <float>                  (optional, for TFLOPS reporting)
//   copts <path>                   (optional serialized CompileOptionsProto)
//
// Timing: all iterations are dispatched back-to-back (device executions on a
// single stream serialize), each iteration's outputs destroyed as the next is
// dispatched, and only the final completion event is awaited — so the tunnel
// round-trip is paid once, not per iteration (mirrors bench/harness.py's
// chained-scan rationale).

#include <dlfcn.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <algorithm>
#include <deque>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  fprintf(stderr, "FATAL %s: %.*s\n", what, (int)margs.message_size,
          margs.message);
  exit(1);
}

void AwaitAndDestroy(PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args aw;
  memset(&aw, 0, sizeof(aw));
  aw.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aw.event = event;
  Check(g_api->PJRT_Event_Await(&aw), what);
  PJRT_Event_Destroy_Args de;
  memset(&de, 0, sizeof(de));
  de.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  de.event = event;
  Check(g_api->PJRT_Event_Destroy(&de), "event destroy");
}

void DestroyBuffer(PJRT_Buffer* buf) {
  PJRT_Buffer_Destroy_Args args;
  memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  args.buffer = buf;
  Check(g_api->PJRT_Buffer_Destroy(&args), "buffer destroy");
}

struct ArgSpec {
  PJRT_Buffer_Type type;
  std::vector<int64_t> dims;
  size_t elem_bytes;
};

PJRT_Buffer_Type ParseDtype(const std::string& s, size_t* elem_bytes) {
  if (s == "f32") { *elem_bytes = 4; return PJRT_Buffer_Type_F32; }
  if (s == "bf16") { *elem_bytes = 2; return PJRT_Buffer_Type_BF16; }
  if (s == "f16") { *elem_bytes = 2; return PJRT_Buffer_Type_F16; }
  if (s == "s32") { *elem_bytes = 4; return PJRT_Buffer_Type_S32; }
  if (s == "s8") { *elem_bytes = 1; return PJRT_Buffer_Type_S8; }
  if (s == "f8_e4m3fn") { *elem_bytes = 1; return PJRT_Buffer_Type_F8E4M3FN; }
  fprintf(stderr, "FATAL: unknown dtype %s\n", s.c_str());
  exit(1);
}

double NowSeconds() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

// --- dtype decode for --check (host-side error math in f64) -------------------

float HalfToFloat(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) { man <<= 1; ++shift; }
      man &= 0x3FF;
      bits = sign | ((127 - 15 - shift) << 23) | (man << 13);
    }
  } else if (exp == 0x1F) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  memcpy(&out, &bits, sizeof(out));
  return out;
}

double DecodeElem(const uint8_t* p, PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: { float f; memcpy(&f, p, 4); return f; }
    case PJRT_Buffer_Type_BF16: {
      uint16_t u; memcpy(&u, p, 2);
      uint32_t bits = (uint32_t)u << 16;
      float f; memcpy(&f, &bits, 4); return f;
    }
    case PJRT_Buffer_Type_F16: {
      uint16_t u; memcpy(&u, p, 2); return HalfToFloat(u);
    }
    case PJRT_Buffer_Type_S32: { int32_t v; memcpy(&v, p, 4); return v; }
    case PJRT_Buffer_Type_S8: return (double)(int8_t)*p;
    default:
      fprintf(stderr, "FATAL: --check cannot decode dtype %d\n", (int)t);
      exit(1);
  }
}

size_t ElemBytes(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: case PJRT_Buffer_Type_S32: return 4;
    case PJRT_Buffer_Type_BF16: case PJRT_Buffer_Type_F16: return 2;
    case PJRT_Buffer_Type_S8: case PJRT_Buffer_Type_F8E4M3FN: return 1;
    default: return 0;
  }
}

uint16_t FloatToHalf(float f) {
  uint32_t bits;
  memcpy(&bits, &f, 4);
  uint32_t sign = (bits >> 16) & 0x8000;
  int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
  uint32_t man = (bits >> 13) & 0x3FF;
  if (exp <= 0) return (uint16_t)sign;          // flush tiny to zero
  if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00);
  return (uint16_t)(sign | (exp << 10) | man);
}

// --check inputs: deterministic values in [-1, 1], encoded per dtype — the
// reference's error-check fills (utils.h:97-103 rand [-1,1]); the bench
// fill's raw byte pattern would put garbage exponents in float inputs.
void FillCheckValue(uint8_t* p, PJRT_Buffer_Type t, uint32_t* state) {
  *state = *state * 1664525u + 1013904223u;
  float v = (float)((*state >> 8) & 0xFFFF) / 32768.0f - 1.0f;
  switch (t) {
    case PJRT_Buffer_Type_F32: memcpy(p, &v, 4); break;
    case PJRT_Buffer_Type_BF16: {
      uint32_t bits; memcpy(&bits, &v, 4);
      uint16_t b = (uint16_t)(bits >> 16);  // truncate: fine for inputs
      memcpy(p, &b, 2); break;
    }
    case PJRT_Buffer_Type_F16: {
      uint16_t h = FloatToHalf(v); memcpy(p, &h, 2); break;
    }
    case PJRT_Buffer_Type_S32: {
      int32_t i = (int32_t)(v * 100.0f); memcpy(p, &i, 4); break;
    }
    case PJRT_Buffer_Type_S8: *p = (uint8_t)(int8_t)(v * 100.0f); break;
    default: *p = 0;
  }
}

// Client-create options. Strings are stored in a deque to keep c_str()
// pointers stable while the PJRT_NamedValue array is alive (a vector's
// reallocation would move SSO strings and invalidate them).
struct Options {
  std::deque<std::string> storage;
  std::vector<PJRT_NamedValue> values;

  const char* Intern(const std::string& s) {
    storage.push_back(s);
    return storage.back().c_str();
  }

  void AddString(const std::string& name, const std::string& val) {
    PJRT_NamedValue nv;
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = Intern(name);
    nv.name_size = name.size();
    nv.type = PJRT_NamedValue_kString;
    nv.string_value = Intern(val);
    nv.value_size = val.size();
    values.push_back(nv);
  }

  void AddInt(const std::string& name, int64_t val) {
    PJRT_NamedValue nv;
    memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = Intern(name);
    nv.name_size = name.size();
    nv.type = PJRT_NamedValue_kInt64;
    nv.int64_value = val;
    nv.value_size = 1;
    values.push_back(nv);
  }

};

// Defaults matching the axon sitecustomize registration
// (/root/.axon_site/sitecustomize.py + axon/register/pjrt.py): pool mode with
// topology + fresh session id, remote compile, monoclient rank sentinel.
void AxonDefaultOptions(Options* o) {
  // relay env the python sitecustomize would have set (loopback tunnel)
  const char* pool_ips = getenv("PALLAS_AXON_POOL_IPS");
  if (pool_ips && !getenv("AXON_POOL_SVC_OVERRIDE")) {
    setenv("AXON_POOL_SVC_OVERRIDE", pool_ips, 0);
    setenv("AXON_LOOPBACK_RELAY", "1", 0);
    setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
  }
  const char* gen = getenv("PALLAS_AXON_TPU_GEN");
  std::string topo = std::string(gen ? gen : "v5e") + ":1x1x1";
  char sid[64];
  snprintf(sid, sizeof(sid), "pjrt-bench-%d-%.0f", (int)getpid(),
           NowSeconds() * 1e3);
  // ints, not bools: the plugin's NamedValue decoding has no Bool arm (the
  // python registration passes 0/1 ints for the same reason)
  o->AddInt("remote_compile", 1);
  o->AddInt("local_only", 0);
  o->AddInt("priority", 0);
  o->AddString("topology", topo);
  o->AddInt("n_slices", 1);
  o->AddString("session_id", sid);
  o->AddInt("rank", 0xFFFFFFFFll);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: %s <plugin.so> <module.mlir> <manifest.txt> [iters]\n",
            argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const char* mlir_path = argv[2];
  const char* manifest_path = argv[3];
  int iters = (argc > 4 && argv[4][0] != '-') ? atoi(argv[4]) : 50;

  std::string check_path;
  double tol = 1e-3, rtol = 1e-2;  // pass bar: max_err <= tol + rtol*max|want|
  for (int i = 4; i < argc - 1; ++i) {
    if (strcmp(argv[i], "--check") == 0) check_path = argv[i + 1];
    if (strcmp(argv[i], "--tol") == 0) tol = atof(argv[i + 1]);
    if (strcmp(argv[i], "--rtol") == 0) rtol = atof(argv[i + 1]);
  }

  Options options;
  for (int i = 4; i < argc - 1; ++i) {
    if (strcmp(argv[i], "-o") == 0) {
      std::string kv = argv[i + 1];
      size_t eq = kv.find('='), colon = kv.find(':', eq);
      if (eq == std::string::npos || colon == std::string::npos) {
        fprintf(stderr, "FATAL: bad -o %s (want name=s:val or name=i:val)\n",
                kv.c_str());
        return 2;
      }
      std::string name = kv.substr(0, eq);
      char type = kv[eq + 1];
      std::string val = kv.substr(colon + 1);
      if (type == 's') options.AddString(name, val);
      else options.AddInt(name, atoll(val.c_str()));
    }
  }
  if (options.values.empty() && strstr(plugin_path, "axon")) {
    AxonDefaultOptions(&options);
  }

  // --- load plugin ------------------------------------------------------------
  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) {
    fprintf(stderr, "FATAL dlopen(%s): %s\n", plugin_path, dlerror());
    return 1;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(handle, "GetPjrtApi"));
  if (!get_api) {
    fprintf(stderr, "FATAL: no GetPjrtApi in %s\n", plugin_path);
    return 1;
  }
  g_api = get_api();
  fprintf(stderr, "plugin PJRT API v%d.%d (header v%d.%d)\n",
          g_api->pjrt_api_version.major_version,
          g_api->pjrt_api_version.minor_version, PJRT_API_MAJOR,
          PJRT_API_MINOR);

  PJRT_Plugin_Initialize_Args init_args;
  memset(&init_args, 0, sizeof(init_args));
  init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(g_api->PJRT_Plugin_Initialize(&init_args), "plugin init");

  // --- client + device --------------------------------------------------------
  PJRT_Client_Create_Args cargs;
  memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = options.values.data();
  cargs.num_options = options.values.size();
  Check(g_api->PJRT_Client_Create(&cargs), "client create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args dargs;
  memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&dargs), "devices");
  if (dargs.num_addressable_devices == 0) {
    fprintf(stderr, "FATAL: no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = dargs.addressable_devices[0];
  fprintf(stderr, "devices: %zu (using first)\n",
          dargs.num_addressable_devices);

  // --- manifest -----------------------------------------------------------------
  std::vector<ArgSpec> specs;
  double flops = 0.0;
  int chain_idx = -1;
  std::string copts_bytes;
  {
    std::ifstream mf(manifest_path);
    if (!mf) { fprintf(stderr, "FATAL: cannot read %s\n", manifest_path); return 1; }
    std::string kind;
    while (mf >> kind) {
      if (kind == "arg") {
        std::string dt, shape;
        mf >> dt >> shape;
        ArgSpec spec;
        spec.type = ParseDtype(dt, &spec.elem_bytes);
        std::stringstream ss(shape);
        std::string d;
        while (std::getline(ss, d, 'x')) spec.dims.push_back(atoll(d.c_str()));
        specs.push_back(spec);
      } else if (kind == "flops") {
        mf >> flops;
      } else if (kind == "chain") {
        mf >> chain_idx;
      } else if (kind == "copts") {
        std::string path;
        mf >> path;
        std::ifstream cf(path, std::ios::binary);
        std::stringstream buf;
        buf << cf.rdbuf();
        copts_bytes = buf.str();
      } else {
        std::string rest;
        std::getline(mf, rest);
      }
    }
  }

  // --- compile --------------------------------------------------------------
  std::string mlir_storage;  // must outlive compilation
  auto compile_file = [&](const char* path) -> PJRT_LoadedExecutable* {
    {
      std::ifstream f(path, std::ios::binary);
      if (!f) { fprintf(stderr, "FATAL: cannot read %s\n", path); exit(1); }
      std::stringstream buf;
      buf << f.rdbuf();
      mlir_storage = buf.str();
    }
    PJRT_Program program;
    memset(&program, 0, sizeof(program));
    program.struct_size = PJRT_Program_STRUCT_SIZE;
    program.code = mlir_storage.data();
    program.code_size = mlir_storage.size();
    static const char kFormat[] = "mlir";
    program.format = kFormat;
    program.format_size = sizeof(kFormat) - 1;

    PJRT_Client_Compile_Args comp;
    memset(&comp, 0, sizeof(comp));
    comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    comp.client = client;
    comp.program = &program;
    comp.compile_options = copts_bytes.data();
    comp.compile_options_size = copts_bytes.size();
    double tc0 = NowSeconds();
    Check(g_api->PJRT_Client_Compile(&comp), "compile");
    fprintf(stderr, "compiled %s in %.1fs\n", path, NowSeconds() - tc0);
    return comp.executable;
  };
  PJRT_LoadedExecutable* exec = compile_file(mlir_path);

  // --- input buffers -----------------------------------------------------------
  std::vector<PJRT_Buffer*> inputs;
  uint32_t fill_state = 0x243F6A88u;
  for (const ArgSpec& spec : specs) {
    size_t n = spec.elem_bytes;
    for (int64_t d : spec.dims) n *= d;
    std::vector<uint8_t> host(n);
    if (!check_path.empty()) {
      // numeric mode: real [-1,1] values per dtype
      for (size_t i = 0; i < n; i += spec.elem_bytes)
        FillCheckValue(host.data() + i, spec.type, &fill_state);
    } else {
      // timing mode: deterministic small-valued byte fill (numerics unused)
      for (size_t i = 0; i < n; ++i) host[i] = (uint8_t)(0x3C ^ (i * 29 % 64));
    }

    PJRT_Client_BufferFromHostBuffer_Args bargs;
    memset(&bargs, 0, sizeof(bargs));
    bargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bargs.client = client;
    bargs.data = host.data();
    bargs.type = spec.type;
    bargs.dims = spec.dims.data();
    bargs.num_dims = spec.dims.size();
    bargs.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bargs.device = device;
    Check(g_api->PJRT_Client_BufferFromHostBuffer(&bargs), "h2d");
    AwaitAndDestroy(bargs.done_with_host_buffer, "h2d await");
    inputs.push_back(bargs.buffer);
  }

  // --- output arity ----------------------------------------------------------
  PJRT_LoadedExecutable_GetExecutable_Args ge;
  memset(&ge, 0, sizeof(ge));
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  Check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "get executable");
  PJRT_Executable_NumOutputs_Args no;
  memset(&no, 0, sizeof(no));
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  Check(g_api->PJRT_Executable_NumOutputs(&no), "num outputs");
  size_t num_outputs = no.num_outputs;

  // --- numeric verification (--check) ----------------------------------------
  // gemm_error_check analog: run module and oracle on the SAME inputs, read
  // every output back, print max/mean abs error, fail past --tol.
  if (!check_path.empty()) {
    auto run_once = [&](PJRT_LoadedExecutable* e,
                        size_t n_out) -> std::vector<PJRT_Buffer*> {
      std::vector<PJRT_Buffer*> outs(n_out, nullptr);
      PJRT_Buffer** out_list[1] = {outs.data()};
      PJRT_Buffer* const* args_list[1] = {inputs.data()};
      PJRT_ExecuteOptions eopts;
      memset(&eopts, 0, sizeof(eopts));
      eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
      PJRT_Event* ev = nullptr;
      PJRT_LoadedExecutable_Execute_Args ex;
      memset(&ex, 0, sizeof(ex));
      ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
      ex.executable = e;
      ex.options = &eopts;
      ex.argument_lists = args_list;
      ex.num_devices = 1;
      ex.num_args = inputs.size();
      ex.output_lists = out_list;
      ex.device_complete_events = &ev;
      Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "execute (check)");
      AwaitAndDestroy(ev, "execute await (check)");
      return outs;
    };
    auto read_back = [&](PJRT_Buffer* b, PJRT_Buffer_Type* type_out)
        -> std::vector<uint8_t> {
      PJRT_Buffer_ElementType_Args et;
      memset(&et, 0, sizeof(et));
      et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
      et.buffer = b;
      Check(g_api->PJRT_Buffer_ElementType(&et), "element type");
      *type_out = et.type;
      PJRT_Buffer_ToHostBuffer_Args th;
      memset(&th, 0, sizeof(th));
      th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      th.src = b;
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "readback size (check)");
      std::vector<uint8_t> host(th.dst_size);
      th.dst = host.data();
      Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "readback (check)");
      AwaitAndDestroy(th.event, "readback await (check)");
      return host;
    };

    PJRT_LoadedExecutable* oracle = compile_file(check_path.c_str());
    PJRT_LoadedExecutable_GetExecutable_Args ge2;
    memset(&ge2, 0, sizeof(ge2));
    ge2.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge2.loaded_executable = oracle;
    Check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge2), "get oracle");
    PJRT_Executable_NumOutputs_Args no2;
    memset(&no2, 0, sizeof(no2));
    no2.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    no2.executable = ge2.executable;
    Check(g_api->PJRT_Executable_NumOutputs(&no2), "oracle num outputs");
    if (no2.num_outputs != num_outputs) {
      fprintf(stderr, "FATAL: --check arity mismatch (%zu vs %zu outputs)\n",
              num_outputs, no2.num_outputs);
      return 1;
    }

    std::vector<PJRT_Buffer*> got = run_once(exec, num_outputs);
    std::vector<PJRT_Buffer*> want = run_once(oracle, num_outputs);
    double max_err = 0.0, sum_err = 0.0, wmax = 0.0;
    size_t n_total = 0;
    for (size_t oi = 0; oi < num_outputs; ++oi) {
      PJRT_Buffer_Type tg, tw;
      std::vector<uint8_t> hg = read_back(got[oi], &tg);
      std::vector<uint8_t> hw = read_back(want[oi], &tw);
      size_t eg = ElemBytes(tg), ew = ElemBytes(tw);
      size_t n = hg.size() / eg;
      if (n != hw.size() / ew) {
        fprintf(stderr, "FATAL: --check output %zu size mismatch\n", oi);
        return 1;
      }
      for (size_t i = 0; i < n; ++i) {
        double g = DecodeElem(hg.data() + i * eg, tg);
        double w = DecodeElem(hw.data() + i * ew, tw);
        double ad = g > w ? g - w : w - g;
        double aw = w < 0 ? -w : w;
        if (ad > max_err) max_err = ad;
        if (aw > wmax) wmax = aw;
        sum_err += ad;
      }
      n_total += n;
      DestroyBuffer(got[oi]);
      DestroyBuffer(want[oi]);
    }
    double mean_err = n_total ? sum_err / n_total : 0.0;
    double bar = tol + rtol * wmax;
    bool ok = max_err <= bar;
    printf("{\"check\": \"%s\", \"max_abs_err\": %.6g, \"mean_abs_err\": "
           "%.6g, \"max_abs_ref\": %.6g, \"bar\": %.6g, \"elems\": %zu}\n",
           ok ? "PASS" : "FAIL", max_err, mean_err, wmax, bar, n_total);
    for (PJRT_Buffer* b : inputs) DestroyBuffer(b);
    return ok ? 0 : 1;
  }

  // --- execute loop ------------------------------------------------------------
  PJRT_ExecuteOptions opts;
  memset(&opts, 0, sizeof(opts));
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  std::vector<PJRT_Buffer*> outputs(num_outputs, nullptr);
  PJRT_Buffer** output_list[1] = {outputs.data()};
  PJRT_Buffer* const* arg_list[1] = {inputs.data()};

  auto execute = [&](PJRT_Event** event_out) {
    PJRT_LoadedExecutable_Execute_Args ex;
    memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &opts;
    ex.argument_lists = arg_list;
    ex.num_devices = 1;
    ex.num_args = inputs.size();
    ex.output_lists = output_list;
    ex.device_complete_events = event_out;
    Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "execute");
  };

  // One timed run of n chained iterations ending in a full device->host
  // readback of output 0, which is the only reliable completion fence
  // through the relay (the execute completion event can resolve at
  // dispatch-ack). With `chain`, output 0 replaces inputs[chain_idx] every
  // iteration, serializing device executions exactly like the python
  // harness's chained lax.scan.
  PJRT_Buffer* original_chain_input =
      chain_idx >= 0 ? inputs[chain_idx] : nullptr;
  auto run_chained = [&](int n) -> double {
    if (chain_idx >= 0) inputs[chain_idx] = original_chain_input;
    double t0 = NowSeconds();
    PJRT_Buffer* prev_chained = nullptr;
    for (int i = 0; i < n; ++i) {
      PJRT_Event* ev = nullptr;
      execute(&ev);
      PJRT_Event_Destroy_Args de;
      memset(&de, 0, sizeof(de));
      de.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      de.event = ev;
      Check(g_api->PJRT_Event_Destroy(&de), "event destroy");
      if (prev_chained) DestroyBuffer(prev_chained);
      if (chain_idx >= 0 && i + 1 < n) {
        inputs[chain_idx] = outputs[0];
        prev_chained = outputs[0];
        for (size_t oi = 1; oi < outputs.size(); ++oi)
          DestroyBuffer(outputs[oi]);
      } else if (i + 1 < n) {
        for (PJRT_Buffer* b : outputs) DestroyBuffer(b);
        prev_chained = nullptr;
      }
    }
    // completion fence: read output 0 back fully
    PJRT_Buffer_ToHostBuffer_Args th;
    memset(&th, 0, sizeof(th));
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outputs[0];
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "readback size");
    std::vector<uint8_t> host(th.dst_size);
    th.dst = host.data();
    Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "readback");
    AwaitAndDestroy(th.event, "readback await");
    double dt = NowSeconds() - t0;
    for (PJRT_Buffer* b : outputs) DestroyBuffer(b);
    if (chain_idx >= 0) inputs[chain_idx] = original_chain_input;
    return dt;
  };

  run_chained(2);  // warmup (also validates the program runs)
  // two-point measurement: the fixed readback/dispatch cost cancels in the
  // difference (same rationale as bench/decode_bench.py); best-of-3 on both
  // points rides out relay latency spikes
  int n_lo = iters / 5 > 0 ? iters / 5 : 1;
  double t_hi = 1e30, t_lo = 1e30;
  for (int r = 0; r < 3; ++r) {
    double hi = run_chained(iters);
    double lo = run_chained(n_lo);
    fprintf(stderr, "rep %d: t(%d)=%.1fms t(%d)=%.1fms\n", r, iters, hi * 1e3,
            n_lo, lo * 1e3);
    t_hi = std::min(t_hi, hi);
    t_lo = std::min(t_lo, lo);
  }
  double per_iter = (t_hi - t_lo) / (iters - n_lo);

  double mean_ms = per_iter * 1e3;
  printf("{\"mean_ms\": %.6f", mean_ms);
  if (flops > 0) printf(", \"tflops\": %.2f", flops / per_iter / 1e12);
  printf(", \"iters\": %d}\n", iters);

  for (PJRT_Buffer* b : inputs) DestroyBuffer(b);
  PJRT_Client_Destroy_Args cd;
  memset(&cd, 0, sizeof(cd));
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = client;
  Check(g_api->PJRT_Client_Destroy(&cd), "client destroy");
  return 0;
}
