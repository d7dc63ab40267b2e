// Native engine-core: page-granular radix prefix tree + page allocator.
//
// C++ implementation of the host-side hot path of the scheduler
// (semantics identical to nanovllmx_tpu/engine/radix_tree.py and
// page_allocator.py; the Python classes remain as the reference
// implementation and CPU fallback, and the test suite runs both for parity).
// The reference keeps all of this in Python (`nanovllmx/core/kv_cache.py`);
// at production batch sizes the radix walk + insert on every admission and
// finish sits on the engine critical path between device super-steps, so the
// framework ships it native (CPython C API; this image has no pybind11).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <memory>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

using Token = int64_t;
using Page = int64_t;

struct Node {
  Node* parent = nullptr;
  // child key: first page_size tokens of the child's key
  std::unordered_map<size_t, std::vector<std::pair<std::vector<Token>, Node*>>>
      children;  // hash -> (key chunk, node) with collision chaining
  std::vector<Token> key;   // length % page_size == 0
  std::vector<Page> pages;  // length == key.size() / page_size
  int64_t ref_count = 0;
  int64_t access_time = 0;

  bool is_leaf() const { return children.empty(); }
};

size_t hash_chunk(const Token* t, size_t n) {
  size_t h = 1469598103934665603ull;
  for (size_t i = 0; i < n; i++) {
    h ^= static_cast<size_t>(t[i]);
    h *= 1099511628211ull;
  }
  return h;
}

struct Tree {
  size_t page_size;
  Node root;
  int64_t clock = 0;
  int64_t num_cached_pages = 0;
  std::vector<std::unique_ptr<Node>> arena;

  explicit Tree(size_t ps) : page_size(ps) { root.ref_count = 1; }

  Node* new_node() {
    arena.push_back(std::make_unique<Node>());
    return arena.back().get();
  }

  Node* find_child(Node* n, const Token* chunk) {
    auto it = n->children.find(hash_chunk(chunk, page_size));
    if (it == n->children.end()) return nullptr;
    for (auto& [k, child] : it->second) {
      if (std::equal(k.begin(), k.end(), chunk)) return child;
    }
    return nullptr;
  }

  void attach_child(Node* parent, Node* child) {
    size_t h = hash_chunk(child->key.data(), page_size);
    parent->children[h].emplace_back(
        std::vector<Token>(child->key.begin(),
                           child->key.begin() + page_size),
        child);
  }

  void detach_child(Node* parent, Node* child) {
    size_t h = hash_chunk(child->key.data(), page_size);
    auto it = parent->children.find(h);
    if (it == parent->children.end()) return;
    auto& vec = it->second;
    for (size_t i = 0; i < vec.size(); i++) {
      if (vec[i].second == child) {
        vec.erase(vec.begin() + i);
        break;
      }
    }
    if (vec.empty()) parent->children.erase(it);
  }

  // Split node so its first num_pages pages become a new parent; returns it.
  Node* split(Node* node, size_t num_pages) {
    Node* upper = new_node();
    size_t cut = num_pages * page_size;
    upper->parent = node->parent;
    upper->key.assign(node->key.begin(), node->key.begin() + cut);
    upper->pages.assign(node->pages.begin(), node->pages.begin() + num_pages);
    upper->ref_count = node->ref_count;
    upper->access_time = node->access_time;

    detach_child(node->parent, node);
    node->key.erase(node->key.begin(), node->key.begin() + cut);
    node->pages.erase(node->pages.begin(), node->pages.begin() + num_pages);
    node->parent = upper;
    attach_child(upper, node);
    attach_child(upper->parent, upper);
    return upper;
  }

  // Longest page-aligned cached prefix. Returns (pages, last node).
  std::pair<std::vector<Page>, Node*> match_prefix(
      const std::vector<Token>& tokens) {
    int64_t now = ++clock;
    size_t nchunks = tokens.size() / page_size;
    Node* node = &root;
    node->access_time = now;
    std::vector<Page> out;
    size_t i = 0;
    while (i < nchunks) {
      Node* child = find_child(node, tokens.data() + i * page_size);
      if (!child) break;
      size_t child_chunks = child->pages.size();
      size_t j = 1;  // first chunk matched by child lookup
      while (i + j < nchunks && j < child_chunks &&
             std::equal(child->key.begin() + j * page_size,
                        child->key.begin() + (j + 1) * page_size,
                        tokens.begin() + (i + j) * page_size)) {
        j++;
      }
      if (j < child_chunks) child = split(child, j);
      child->access_time = now;
      out.insert(out.end(), child->pages.begin(), child->pages.end());
      i += j;
      node = child;
    }
    return {std::move(out), node};
  }

  // Insert page-aligned tokens backed by pages; dedups existing prefixes.
  // Returns (dup pages to free, canonical pages, last node).
  std::tuple<std::vector<Page>, std::vector<Page>, Node*> insert(
      const std::vector<Token>& tokens, const std::vector<Page>& pages) {
    int64_t now = ++clock;
    size_t nchunks = tokens.size() / page_size;
    Node* node = &root;
    node->access_time = now;
    std::vector<Page> dups, canonical;
    size_t i = 0;
    while (i < nchunks) {
      Node* child = find_child(node, tokens.data() + i * page_size);
      if (!child) {
        Node* nn = new_node();
        nn->parent = node;
        nn->key.assign(tokens.begin() + i * page_size,
                       tokens.begin() + nchunks * page_size);
        nn->pages.assign(pages.begin() + i, pages.begin() + nchunks);
        nn->access_time = now;
        attach_child(node, nn);
        num_cached_pages += static_cast<int64_t>(nn->pages.size());
        canonical.insert(canonical.end(), nn->pages.begin(), nn->pages.end());
        return {std::move(dups), std::move(canonical), nn};
      }
      size_t child_chunks = child->pages.size();
      size_t j = 1;
      while (i + j < nchunks && j < child_chunks &&
             std::equal(child->key.begin() + j * page_size,
                        child->key.begin() + (j + 1) * page_size,
                        tokens.begin() + (i + j) * page_size)) {
        j++;
      }
      if (j < child_chunks) child = split(child, j);
      child->access_time = now;
      for (size_t k = 0; k < j; k++) {
        if (pages[i + k] != child->pages[k]) dups.push_back(pages[i + k]);
      }
      canonical.insert(canonical.end(), child->pages.begin(),
                       child->pages.end());
      i += j;
      node = child;
    }
    return {std::move(dups), std::move(canonical), node};
  }

  void lock(Node* n) {
    for (; n; n = n->parent) n->ref_count++;
  }
  void unlock(Node* n) {
    for (; n; n = n->parent) n->ref_count--;
  }

  std::vector<Page> evict(int64_t need) {
    std::vector<Page> freed;
    // gather unlocked leaves
    using Entry = std::pair<int64_t, Node*>;  // (access_time, node)
    std::priority_queue<Entry, std::vector<Entry>, std::greater<>> heap;
    std::vector<Node*> stack = {&root};
    while (!stack.empty()) {
      Node* n = stack.back();
      stack.pop_back();
      if (n != &root && n->is_leaf() && n->ref_count == 0)
        heap.emplace(n->access_time, n);
      for (auto& [h, vec] : n->children)
        for (auto& [k, c] : vec) stack.push_back(c);
    }
    while (!heap.empty() && static_cast<int64_t>(freed.size()) < need) {
      Node* n = heap.top().second;
      heap.pop();
      if (n->ref_count != 0 || !n->is_leaf() || n == &root) continue;
      freed.insert(freed.end(), n->pages.begin(), n->pages.end());
      num_cached_pages -= static_cast<int64_t>(n->pages.size());
      Node* parent = n->parent;
      detach_child(parent, n);
      if (parent != &root && parent->is_leaf() && parent->ref_count == 0)
        heap.emplace(parent->access_time, parent);
    }
    return freed;
  }
};

// ------------------------------------------------------------- Python glue

struct TreeObject {
  PyObject_HEAD
  Tree* tree;
  // stable handles for nodes exposed to Python
  std::unordered_map<int64_t, Node*>* handles;
  std::unordered_map<Node*, int64_t>* rev;
  int64_t next_handle;
};

int64_t handle_for(TreeObject* self, Node* n) {
  auto it = self->rev->find(n);
  if (it != self->rev->end()) return it->second;
  int64_t h = self->next_handle++;
  (*self->handles)[h] = n;
  (*self->rev)[n] = h;
  return h;
}

static bool to_vec(PyObject* seq, std::vector<int64_t>* out) {
  PyObject* fast = PySequence_Fast(seq, "expected a sequence");
  if (!fast) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->reserve(n);
  for (Py_ssize_t i = 0; i < n; i++) {
    out->push_back(PyLong_AsLongLong(PySequence_Fast_GET_ITEM(fast, i)));
  }
  Py_DECREF(fast);
  return !PyErr_Occurred();
}

static PyObject* from_vec(const std::vector<int64_t>& v) {
  PyObject* list = PyList_New(v.size());
  for (size_t i = 0; i < v.size(); i++) {
    PyList_SET_ITEM(list, i, PyLong_FromLongLong(v[i]));
  }
  return list;
}

static PyObject* tree_new(PyTypeObject* type, PyObject* args, PyObject* kw) {
  long page_size;
  static const char* kwlist[] = {"page_size", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kw, "l",
                                   const_cast<char**>(kwlist), &page_size))
    return nullptr;
  TreeObject* self = reinterpret_cast<TreeObject*>(type->tp_alloc(type, 0));
  if (!self) return nullptr;
  self->tree = new Tree(static_cast<size_t>(page_size));
  self->handles = new std::unordered_map<int64_t, Node*>();
  self->rev = new std::unordered_map<Node*, int64_t>();
  self->next_handle = 1;
  // handle 0 == root
  (*self->handles)[0] = &self->tree->root;
  (*self->rev)[&self->tree->root] = 0;
  return reinterpret_cast<PyObject*>(self);
}

static void tree_dealloc(TreeObject* self) {
  delete self->tree;
  delete self->handles;
  delete self->rev;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

static PyObject* tree_match_prefix(TreeObject* self, PyObject* arg) {
  std::vector<int64_t> tokens;
  if (!to_vec(arg, &tokens)) return nullptr;
  auto [pages, node] = self->tree->match_prefix(tokens);
  return Py_BuildValue("(NL)", from_vec(pages), handle_for(self, node));
}

static PyObject* tree_insert(TreeObject* self, PyObject* args) {
  PyObject *tok_obj, *page_obj;
  if (!PyArg_ParseTuple(args, "OO", &tok_obj, &page_obj)) return nullptr;
  std::vector<int64_t> tokens, pages;
  if (!to_vec(tok_obj, &tokens) || !to_vec(page_obj, &pages)) return nullptr;
  if (pages.size() < tokens.size() / self->tree->page_size) {
    PyErr_SetString(PyExc_ValueError, "insert needs one page per full chunk");
    return nullptr;
  }
  auto [dups, canonical, node] = self->tree->insert(tokens, pages);
  return Py_BuildValue("(NNL)", from_vec(dups), from_vec(canonical),
                       handle_for(self, node));
}

static Node* node_from_handle(TreeObject* self, int64_t h) {
  auto it = self->handles->find(h);
  if (it == self->handles->end()) {
    PyErr_SetString(PyExc_KeyError, "unknown node handle");
    return nullptr;
  }
  return it->second;
}

static PyObject* tree_lock(TreeObject* self, PyObject* arg) {
  Node* n = node_from_handle(self, PyLong_AsLongLong(arg));
  if (!n) return nullptr;
  self->tree->lock(n);
  Py_RETURN_NONE;
}

static PyObject* tree_unlock(TreeObject* self, PyObject* arg) {
  Node* n = node_from_handle(self, PyLong_AsLongLong(arg));
  if (!n) return nullptr;
  self->tree->unlock(n);
  Py_RETURN_NONE;
}

static PyObject* tree_evict(TreeObject* self, PyObject* arg) {
  long need = PyLong_AsLong(arg);
  if (need < 0 && PyErr_Occurred()) return nullptr;
  return from_vec(self->tree->evict(need));
}

static PyObject* tree_num_cached(TreeObject* self, void*) {
  return PyLong_FromLongLong(self->tree->num_cached_pages);
}

static PyMethodDef tree_methods[] = {
    {"match_prefix", reinterpret_cast<PyCFunction>(tree_match_prefix),
     METH_O, "longest page-aligned cached prefix -> (pages, node_handle)"},
    {"insert", reinterpret_cast<PyCFunction>(tree_insert), METH_VARARGS,
     "insert(tokens, pages) -> (dup_pages, canonical_pages, node_handle)"},
    {"lock", reinterpret_cast<PyCFunction>(tree_lock), METH_O, "pin path"},
    {"unlock", reinterpret_cast<PyCFunction>(tree_unlock), METH_O,
     "unpin path"},
    {"evict", reinterpret_cast<PyCFunction>(tree_evict), METH_O,
     "evict(n) -> freed pages (LRU unlocked leaves)"},
    {nullptr, nullptr, 0, nullptr},
};

static PyGetSetDef tree_getset[] = {
    {"num_cached_pages", reinterpret_cast<getter>(tree_num_cached), nullptr,
     nullptr, nullptr},
    {nullptr, nullptr, nullptr, nullptr, nullptr},
};

static PyTypeObject TreeType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

static PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_nvx_native",
    "native engine core (radix prefix tree)", -1, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__nvx_native(void) {
  TreeType.tp_name = "_nvx_native.RadixTree";
  TreeType.tp_basicsize = sizeof(TreeObject);
  TreeType.tp_flags = Py_TPFLAGS_DEFAULT;
  TreeType.tp_new = tree_new;
  TreeType.tp_dealloc = reinterpret_cast<destructor>(tree_dealloc);
  TreeType.tp_methods = tree_methods;
  TreeType.tp_getset = tree_getset;
  if (PyType_Ready(&TreeType) < 0) return nullptr;
  PyObject* m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  Py_INCREF(&TreeType);
  PyModule_AddObject(m, "RadixTree",
                     reinterpret_cast<PyObject*>(&TreeType));
  return m;
}
